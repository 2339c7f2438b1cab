"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force cosine top-k — pure JVM expressions
  (``zip_with`` dot product + ``aggregate`` fold, whole-stage codegen,
  TakeOrderedAndProject top-k). The correctness baseline.
- ``lsh_assign`` / ``lsh_topk``: random-hyperplane LSH — sign-bit bucket of
  H seeded hyperplanes; query probes its own bucket plus the ``n_probes``
  nearest buckets by hamming distance. ``lsh_topk`` assigns buckets inline
  (ad-hoc, one-shot); the SCALE path is ``LshVectorIndex``: assign once,
  write ``partitionBy(lsh_bucket)``, and every probe prunes PHYSICALLY to
  the probed partitions (PartitionFilters in the scan), so query cost is
  independent of corpus size.

Hyperplanes derive from splitmix64 (deterministic; no RNG state), mapped to
approximately-normal components by summing 4 uniforms (CLT), which is
sufficient for sign-hash LSH. Plane dots accumulate in ascending-dimension
order (no BLAS), so bucket assignment is bit-reproducible across runs,
partitionings, and the DuckDB oracle's ordered list_reduce fold.
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
    # divide by a float64 2^64 (a Python-int divisor >int64 silently turns
    # the array into dtype=object); x * 2^-64 is IEEE-exact either way
    u = splitmix64(idx).astype(np.float64) / np.float64(2**64)
    g = (u.reshape(n_planes, dim, 4).sum(axis=2) - 2.0) * np.sqrt(3.0)
    return g


def plane_dots(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, n_planes) float64 dot products, accumulated in ascending-dim
    order — deterministic left-fold (matches a SQL ordered list_reduce),
    unlike BLAS matmul whose summation order is unspecified."""
    vecs = np.asarray(vecs, dtype=np.float64)
    planes = np.asarray(planes, dtype=np.float64)
    acc = np.zeros((vecs.shape[0], planes.shape[0]), dtype=np.float64)
    for d in range(vecs.shape[1]):
        acc += vecs[:, d, None] * planes[None, :, d]
    return acc


def lsh_bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit bucket id per row of ``vecs`` (n, dim) -> int64."""
    signs = plane_dots(vecs, planes) > 0
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


def probe_buckets(query_vec, n_planes: int = 12, n_probes: int = 8,
                  seed: int = 5) -> list[int]:
    """The query's bucket plus its nearest buckets in hamming order (ties
    broken by ascending bucket id — stable argsort over ascending ids)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    planes = hyperplanes(qv.size, n_planes, seed)
    qb = int(lsh_bucket_of(qv[None, :], planes)[0])
    all_buckets = np.arange(1 << n_planes, dtype=np.int64)
    ham = np.array([bin(int(b) ^ qb).count("1") for b in all_buckets])
    return all_buckets[np.argsort(ham, kind="stable")][: n_probes].tolist()


def lsh_topk(emb_df: DataFrame, query_vec, k: int = 10, dim: int | None = None,
             n_planes: int = 12, n_probes: int = 8, seed: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k: restrict the exact scorer to the query's
    LSH bucket and its ``n_probes`` nearest buckets (hamming order).
    Ad-hoc/one-shot — assigns buckets inline with a full corpus scan; for
    repeated queries build an ``LshVectorIndex`` once instead."""
    qv = np.asarray(query_vec, dtype=np.float64)
    dim = dim or qv.size
    if qv.size != dim:
        # probe_buckets hashes with planes of the QUERY's dim; a mismatch
        # would silently probe a different hash family than the corpus
        raise ValueError(f"query dim {qv.size} != index dim {dim}")
    probe = probe_buckets(qv, n_planes, n_probes, seed)
    assigned = lsh_assign(emb_df, dim, n_planes, seed, id_col, vec_col)
    cand = assigned.filter(F.col("lsh_bucket").isin(probe))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


class LshVectorIndex:
    """Persisted LSH index: bucket assignment runs ONCE at build, the table
    is written ``partitionBy(lsh_bucket)``, and each query reads only its
    probed partitions — the scan's PartitionFilters prune physically, so
    per-query cost is O(corpus/2^n_planes × n_probes), independent of total
    corpus size. This is the 1000-executor path: queries touch ~n_probes
    parquet directories however many vectors exist.

    Analogous to the reference's persisted index-then-query lifecycle
    (lib/fates.rb:24-49 build → lib/index_reader.rb mmap'd reads), applied
    to the embedding column.
    """

    def __init__(self, path: str, dim: int, n_planes: int = 12,
                 seed: int = 5, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        self.path = path
        self.dim = dim
        self.n_planes = n_planes
        self.seed = seed
        self.id_col = id_col
        self.vec_col = vec_col
        self._df = None  # memoized reader: partition discovery runs once

    @classmethod
    def build(cls, emb_df: DataFrame, path: str, dim: int,
              n_planes: int = 12, seed: int = 5, id_col: str = "vec_id",
              vec_col: str = "embedding") -> "LshVectorIndex":
        idx = cls(path, dim, n_planes, seed, id_col, vec_col)
        planes = hyperplanes(dim, n_planes, seed)

        # assign inline (id, vec, bucket in one Arrow pass — no join), then
        # ONE shuffle keyed on lsh_bucket so each task writes only its own
        # buckets: ~one file per bucket directory instead of
        # n_tasks × n_buckets small files
        def gen(batches):
            for pdf in batches:
                vecs = np.stack(pdf[vec_col].map(
                    lambda v: np.asarray(v, dtype=np.float64)))
                out = pdf[[id_col, vec_col]].copy()
                out["lsh_bucket"] = lsh_bucket_of(vecs, planes)
                yield out

        vec_type = emb_df.schema[vec_col].dataType.simpleString()
        assigned = emb_df.select(id_col, vec_col).mapInPandas(
            gen, f"{id_col} long, {vec_col} {vec_type}, lsh_bucket long")
        n_part = emb_df.sparkSession.sparkContext.defaultParallelism
        (assigned.repartition(n_part, "lsh_bucket")
         .write.mode("overwrite").partitionBy("lsh_bucket").parquet(path))
        return idx

    def _read(self, spark) -> DataFrame:
        if self._df is None:
            self._df = spark.read.parquet(self.path)
        return self._df

    def topk(self, spark, query_vec, k: int = 10,
             n_probes: int = 8) -> DataFrame:
        """Probe-pruned exact top-k over the persisted buckets. The
        ``lsh_bucket IN (...)`` filter lands in the scan's PartitionFilters
        (asserted in tests) — non-probed partitions are never read."""
        qv = np.asarray(query_vec, dtype=np.float64)
        if qv.size != self.dim:
            raise ValueError(f"query dim {qv.size} != index dim {self.dim}")
        probe = probe_buckets(qv, self.n_planes, n_probes, self.seed)
        cand = self._read(spark).filter(F.col("lsh_bucket").isin(probe))
        return cosine_topk(cand, query_vec, k, self.id_col, self.vec_col)
