"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force cosine top-k — pure JVM expressions
  (``zip_with`` dot product + ``aggregate`` fold, whole-stage codegen,
  TakeOrderedAndProject top-k). The correctness baseline.
- ``lsh_assign`` / ``lsh_topk``: random-hyperplane LSH — sign-bit bucket of
  H seeded hyperplanes; query probes its own bucket plus the ``n_probes``
  nearest buckets by hamming distance. The scale path: the scan prunes to
  matching buckets instead of the full corpus (at cluster scale the table is
  written partitioned/bucketed by ``lsh_bucket`` so pruning is physical).

Hyperplanes derive from splitmix64 (deterministic; no RNG state), mapped to
approximately-normal components by summing 4 uniforms (CLT), which is
sufficient for sign-hash LSH.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .corpus import splitmix64


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def _qvec_lit(query_vec) -> "F.Column":
    return F.array(*[F.lit(float(v)) for v in query_vec])


def cosine_topk(emb_df: DataFrame, query_vec, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (vec_id, cosine), order (cosine DESC, vec_id ASC)."""
    q = _qvec_lit(query_vec)
    v = F.col(vec_col).cast("array<double>")
    cos = _dot(v, q) / (_norm(v) * _norm(q))
    return (emb_df.select(F.col(id_col), cos.alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 5) -> np.ndarray:
    """(n_planes, dim) float64, deterministic, ~N(0,1) components."""
    with np.errstate(over="ignore"):
        idx = (np.arange(n_planes * dim * 4, dtype=np.uint64)
               + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
    u = splitmix64(idx).astype(np.float64) / 2**64
    g = (u.reshape(n_planes, dim, 4).sum(axis=2) - 2.0) * np.sqrt(3.0)
    return g


def lsh_bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit bucket id per row of ``vecs`` (n, dim) -> int64."""
    signs = (vecs @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return (signs.astype(np.int64) * weights[None, :]).sum(axis=1)


def lsh_assign(emb_df: DataFrame, dim: int, n_planes: int = 16, seed: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Add an ``lsh_bucket`` column (vectorized Arrow batches)."""
    planes = hyperplanes(dim, n_planes, seed)

    def gen(batches):
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64)))
            pdf = pdf[[id_col]].copy()
            pdf["lsh_bucket"] = lsh_bucket_of(vecs, planes)
            yield pdf

    buckets = emb_df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} long, lsh_bucket long")
    return emb_df.join(buckets, id_col)


def lsh_topk(emb_df: DataFrame, query_vec, k: int = 10, dim: int | None = None,
             n_planes: int = 12, n_probes: int = 8, seed: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k: restrict the exact scorer to the query's
    LSH bucket and its ``n_probes`` nearest buckets (hamming order)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    dim = dim or qv.size
    planes = hyperplanes(dim, n_planes, seed)
    qb = int(lsh_bucket_of(qv[None, :], planes)[0])
    all_buckets = np.arange(1 << n_planes, dtype=np.int64)
    ham = np.array([bin(int(b) ^ qb).count("1") for b in all_buckets])
    probe = all_buckets[np.argsort(ham, kind="stable")][: n_probes].tolist()
    assigned = lsh_assign(emb_df, dim, n_planes, seed, id_col, vec_col)
    cand = assigned.filter(F.col("lsh_bucket").isin(probe))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
