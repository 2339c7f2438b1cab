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


# ---------------------------------------------------------------------------
# IVF (inverted-file) index: deterministic k-means coarse quantizer
# ---------------------------------------------------------------------------
# The second scale path next to LSH: train a small centroid codebook with a
# fixed number of Lloyd iterations, persist vectors partitioned by nearest
# centroid, probe the n_probes nearest cells per query. Training is
# bit-deterministic — reproducible across runs, partitionings, numpy and
# SQL — because every quantity is EXACT in float64:
#   - vectors are quantized to integers q_i = floor(v_i * 4096);
#   - centroids are quantized to the 1/1024 grid
#     (c_i = floor(sum(q)*1024/n)/1024), so each distance term
#     (q_i - c_i)^2 has an integer numerator < 2**46 over denominator
#     2**20, and a 64-term sum stays < 2**53 — no rounding anywhere, so
#     SUMMATION ORDER CANNOT MATTER (numpy axis-sum, SQL chain, any
#     shuffle order all agree bit-wise);
#   - seeds are the n_centroids ids with the smallest md5("{seed}:{id}")
#     hex strings (same lowercase-hex ordering in Spark and DuckDB);
#   - argmin ties break by ascending centroid id (np.argmin first-hit ==
#     SQL ORDER BY dist, cid).
# The per-iteration plan is one narrow pass: mapInPandas computes each
# batch's assignments AND its per-cell partial component sums (map-side
# combine), so the shuffle that follows carries n_partitions x n_cells
# tiny rows, never the vectors.

IVF_QUANT = 4096.0    # vector grid: floor(v * 4096), exact for float32
IVF_CQUANT = 1024.0   # centroid grid: floor(mean * 1024) / 1024


def _ivf_quant(vecs: np.ndarray) -> np.ndarray:
    return np.floor(vecs.astype(np.float64) * IVF_QUANT)


def _ivf_nearest(qv: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """First-hit argmin cell per row of integer-grid ``qv`` against
    grid-quantized ``cent`` — exact float64 arithmetic (see module note),
    so any evaluation order gives the same cells."""
    # (B, nc) squared distances; both operands exact in float64
    d2 = ((qv[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1)


def ivf_train(emb_df: DataFrame, dim: int, n_centroids: int = 8,
              n_iters: int = 2, seed: str = "ivf", id_col: str = "vec_id",
              vec_col: str = "embedding") -> np.ndarray:
    """Deterministic distributed Lloyd: returns the float64
    (n_centroids, dim) codebook on the 1/1024 grid. Each iteration is ONE
    narrow Arrow pass emitting per-batch partial sums (map-side combine)
    plus a tiny final aggregate — the corpus is never shuffled."""
    spark = emb_df.sparkSession
    src = emb_df.select(F.col(id_col).alias("__id"),
                        F.col(vec_col).cast("array<double>").alias("__v"))
    src = src.persist()
    try:
        key = F.md5(F.concat(F.lit(f"{seed}:"),
                             F.col("__id").cast("string")))
        seeds = (src.withColumn("__k", key).orderBy("__k", "__id")
                 .limit(n_centroids).collect())
        if not seeds:
            raise ValueError("cannot train IVF on an empty corpus")
        cent = _ivf_quant(np.array([r["__v"] for r in seeds],
                                   dtype=np.float64))
        for _ in range(n_iters):
            c = cent  # bind for the closure

            def partial_sums(batches):
                acc_s = np.zeros((c.shape[0], dim), dtype=np.float64)
                acc_n = np.zeros(c.shape[0], dtype=np.int64)
                for pdf in batches:
                    if not len(pdf):
                        continue
                    qv = _ivf_quant(np.stack(pdf["__v"].map(
                        lambda v: np.asarray(v, dtype=np.float64))))
                    cid = _ivf_nearest(qv, c)
                    np.add.at(acc_s, cid, qv)
                    np.add.at(acc_n, cid, 1)
                live = np.nonzero(acc_n)[0]
                yield pd.DataFrame({
                    "cid": live.astype(np.int32),
                    "n": acc_n[live],
                    "s": [acc_s[i].astype(np.int64) for i in live]})

            def reduce_cell(pdf: pd.DataFrame) -> pd.DataFrame:
                s = np.stack(pdf["s"].map(
                    lambda v: np.asarray(v, dtype=np.int64))).sum(axis=0)
                return pd.DataFrame({"cid": pdf["cid"].iloc[:1],
                                     "n": [int(pdf["n"].sum())],
                                     "s": [s]})

            # per-cell reduce of the tiny partials (n_partitions x n_cells
            # rows): integer sums are exact at any order, and a grouped
            # pandas reduce sidesteps the plan-compile cost a 64-expression
            # wide aggregate would pay every iteration
            rows = (src.select("__v").mapInPandas(
                        partial_sums, "cid int, n long, s array<long>")
                    .groupBy("cid").applyInPandas(
                        reduce_cell, "cid int, n long, s array<long>")
                    .collect())
            nxt = cent.copy()  # empty cells keep their previous centroid
            for r in rows:
                s = np.asarray(r["s"], dtype=np.float64)
                nxt[r["cid"]] = np.floor(s * IVF_CQUANT
                                         / float(r["n"])) / IVF_CQUANT
            cent = nxt
        return cent
    finally:
        src.unpersist()


def ivf_assign(emb_df: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, vec, ivf_cid): nearest-centroid cell per vector — same
    quantize/distance/tie rules as training, one narrow Arrow pass."""
    c = centroids
    vec_type = emb_df.schema[vec_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            qv = _ivf_quant(np.stack(pdf[vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64))))
            out = pdf[[id_col, vec_col]].copy()
            out["ivf_cid"] = _ivf_nearest(qv, c).astype(np.int32)
            yield out

    return emb_df.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} long, {vec_col} {vec_type}, ivf_cid int")


def ivf_probe_cells(query_vec, centroids: np.ndarray,
                    n_probes: int = 3) -> list[int]:
    """The n_probes nearest cells to the QUANTIZED query, driver-side —
    same exact arithmetic as the distributed assignment and the SQL twin;
    ties by ascending cid."""
    qq = _ivf_quant(np.asarray(query_vec, dtype=np.float64))[None, :]
    d2 = ((qq[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)[0]
    order = np.lexsort((np.arange(centroids.shape[0]), d2))
    return order[:n_probes].tolist()


class IvfVectorIndex:
    """Persisted IVF index: the codebook is trained once, vectors are
    written ``partitionBy(ivf_cid)``, and each query reads only its probed
    cells (PartitionFilters prune physically) then scores exact cosine
    within them — per-query cost is O(corpus × n_probes / n_centroids),
    independent of total corpus size when n_centroids scales with the
    corpus. Complements ``LshVectorIndex``: IVF adapts its cells to the
    data distribution (better recall on clustered corpora), LSH is
    oblivious (no training pass). The codebook lives next to the data in an
    underscore-prefixed file Spark's parquet discovery ignores."""

    def __init__(self, path: str, dim: int, n_centroids: int = 8,
                 n_iters: int = 2, seed: str = "ivf",
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.path = path
        self.dim = dim
        self.n_centroids = n_centroids
        self.n_iters = n_iters
        self.seed = seed
        self.id_col = id_col
        self.vec_col = vec_col
        self._df = None
        self._cent = None

    @property
    def _cent_path(self) -> str:
        import os
        return os.path.join(self.path, "_ivf_centroids.parquet")

    @classmethod
    def build(cls, emb_df: DataFrame, path: str, dim: int,
              n_centroids: int = 8, n_iters: int = 2, seed: str = "ivf",
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> "IvfVectorIndex":
        idx = cls(path, dim, n_centroids, n_iters, seed, id_col, vec_col)
        cent = ivf_train(emb_df, dim, n_centroids, n_iters, seed,
                         id_col, vec_col)
        assigned = ivf_assign(emb_df, cent, id_col, vec_col)
        n_part = emb_df.sparkSession.sparkContext.defaultParallelism
        (assigned.repartition(min(n_part, n_centroids), "ivf_cid")
         .write.mode("overwrite").partitionBy("ivf_cid").parquet(path))
        pd.DataFrame({"cid": range(n_centroids),
                      "carr": [c.tolist() for c in cent]}
                     ).to_parquet(idx._cent_path, index=False)
        idx._cent = cent
        return idx

    def centroids(self) -> np.ndarray:
        if self._cent is None:
            pdf = pd.read_parquet(self._cent_path).sort_values("cid")
            self._cent = np.stack(
                pdf["carr"].map(lambda c: np.asarray(c, dtype=np.float64)))
        return self._cent

    def _read(self, spark) -> DataFrame:
        if self._df is None:
            self._df = spark.read.parquet(self.path)
        return self._df

    def topk(self, spark, query_vec, k: int = 10,
             n_probes: int = 3) -> DataFrame:
        qv = np.asarray(query_vec, dtype=np.float64)
        if qv.size != self.dim:
            raise ValueError(f"query dim {qv.size} != index dim {self.dim}")
        probe = ivf_probe_cells(qv, self.centroids(), n_probes)
        cand = self._read(spark).filter(F.col("ivf_cid").isin(probe))
        return cosine_topk(cand, query_vec, k, self.id_col, self.vec_col)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the 10^12-vector compression path
# ---------------------------------------------------------------------------
# Jegou, Douze, Schmid: "Product Quantization for Nearest Neighbor Search"
# (TPAMI 2011). The vector is split into m_sub contiguous subspaces; each
# subspace gets its own k-means codebook (the same deterministic Lloyd as
# IVF, on the same exact grids); a vector is stored as m_sub small codes
# (here int32 for parquet friendliness; 1 byte each at K<=256 in a binary
# layout). Queries score candidates with ADC (asymmetric distance
# computation): per subspace a K-entry table of exact squared-L2 distances
# from the QUANTIZED query slice to the centroids, then each candidate's
# distance is m_sub table lookups summed — no raw vector ever read.
#
# Why it matters at 100 TB: raw float32 embeddings at dim=64 are 256 B/vec
# (~256 TB at 10^12 vectors); PQ codes at m_sub=4 are 4 B/vec logical — the
# ADC scan reads ~1/64th the bytes, and the distance-table lookups stay
# whole-stage-codegen JVM expressions (element_at on literal arrays). The
# same exactness contract as IVF makes it hash-checkable: vectors on the
# integer floor(x*4096) grid, centroids on the 1/1024 grid, so every
# (q_i - c_i)^2 term, every dsub-term subspace sum, and the final m_sub-way
# ADC sum are exact in float64 — summation order cannot matter, and the
# DuckDB twin (sqloracles.pq_topk_sql) reproduces training, encoding AND
# scoring bit-for-bit.


def pq_train(emb_df: DataFrame, dim: int, m_sub: int = 4,
             n_centroids: int = 8, n_iters: int = 2, seed: str = "pq",
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> np.ndarray:
    """Deterministic per-subspace Lloyd: returns the float64
    (m_sub, n_centroids, dim // m_sub) codebook tensor. ALL subspaces train
    in the SAME narrow Arrow pass per iteration (partials are per
    (subspace, cell) component sums, map-side combined) — the corpus is
    scanned n_iters times total, not m_sub * n_iters, and never shuffled.
    Seeding: the n_centroids md5-smallest ids seed every subspace (one
    shared ordering; seed diversity across subspaces buys nothing and a
    shared ordering keeps the SQL twin one CTE)."""
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    spark = emb_df.sparkSession
    src = emb_df.select(F.col(id_col).alias("__id"),
                        F.col(vec_col).cast("array<double>").alias("__v"))
    src = src.persist()
    try:
        key = F.md5(F.concat(F.lit(f"{seed}:"),
                             F.col("__id").cast("string")))
        seeds = (src.withColumn("__k", key).orderBy("__k", "__id")
                 .limit(n_centroids).collect())
        if not seeds:
            raise ValueError("cannot train PQ on an empty corpus")
        full = _ivf_quant(np.array([r["__v"] for r in seeds],
                                   dtype=np.float64))
        # (m_sub, K, dsub) — subspace m takes columns [m*dsub, (m+1)*dsub)
        cent = np.stack([full[:, m * dsub:(m + 1) * dsub]
                         for m in range(m_sub)])
        for _ in range(n_iters):
            c = cent  # bind for the closure

            def partial_sums(batches):
                acc_s = np.zeros((m_sub, c.shape[1], dsub), dtype=np.float64)
                acc_n = np.zeros((m_sub, c.shape[1]), dtype=np.int64)
                for pdf in batches:
                    if not len(pdf):
                        continue
                    qv = _ivf_quant(np.stack(pdf["__v"].map(
                        lambda v: np.asarray(v, dtype=np.float64))))
                    for m in range(m_sub):
                        sl = qv[:, m * dsub:(m + 1) * dsub]
                        cid = _ivf_nearest(sl, c[m])
                        np.add.at(acc_s[m], cid, sl)
                        np.add.at(acc_n[m], cid, 1)
                ms, cs = np.nonzero(acc_n)
                yield pd.DataFrame({
                    "sub": ms.astype(np.int32),
                    "cid": cs.astype(np.int32),
                    "n": acc_n[ms, cs],
                    "s": [acc_s[m, k].astype(np.int64)
                          for m, k in zip(ms, cs)]})

            def reduce_cell(pdf: pd.DataFrame) -> pd.DataFrame:
                s = np.stack(pdf["s"].map(
                    lambda v: np.asarray(v, dtype=np.int64))).sum(axis=0)
                return pd.DataFrame({"sub": pdf["sub"].iloc[:1],
                                     "cid": pdf["cid"].iloc[:1],
                                     "n": [int(pdf["n"].sum())],
                                     "s": [s]})

            rows = (src.select("__v").mapInPandas(
                        partial_sums, "sub int, cid int, n long, s array<long>")
                    .groupBy("sub", "cid").applyInPandas(
                        reduce_cell, "sub int, cid int, n long, s array<long>")
                    .collect())
            nxt = cent.copy()  # empty cells keep their previous centroid
            for r in rows:
                s = np.asarray(r["s"], dtype=np.float64)
                nxt[r["sub"], r["cid"]] = np.floor(
                    s * IVF_CQUANT / float(r["n"])) / IVF_CQUANT
            cent = nxt
        return cent
    finally:
        src.unpersist()


def pq_encode(emb_df: DataFrame, codebooks: np.ndarray,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int>): per subspace the nearest-centroid code —
    same quantize/distance/tie rules as training, one narrow Arrow pass.
    This is the table that persists: m_sub small ints per vector instead
    of the raw embedding."""
    cb = codebooks
    m_sub, _, dsub = cb.shape

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            qv = _ivf_quant(np.stack(pdf[vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64))))
            codes = np.stack(
                [_ivf_nearest(qv[:, m * dsub:(m + 1) * dsub], cb[m])
                 for m in range(m_sub)], axis=1).astype(np.int32)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "codes": list(codes)})

    return emb_df.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} long, codes array<int>")


def pq_adc_tables(query_vec, codebooks: np.ndarray) -> np.ndarray:
    """(m_sub, K) exact float64 squared-L2 distances from the QUANTIZED
    query's subspace slices to each centroid — the ADC lookup tables.
    Driver-side and tiny (m_sub * K doubles)."""
    cb = codebooks
    m_sub, _, dsub = cb.shape
    qq = _ivf_quant(np.asarray(query_vec, dtype=np.float64))
    return np.stack([
        ((qq[None, m * dsub:(m + 1) * dsub] - cb[m]) ** 2).sum(axis=1)
        for m in range(m_sub)])


def pq_adc_topk(codes_df: DataFrame, query_vec, codebooks: np.ndarray,
                k: int = 10, id_col: str = "vec_id") -> DataFrame:
    """ADC top-k over the codes table: (vec_id, adc), ascending exact
    squared-L2 estimate, ties by vec_id. The scan is pure JVM — the m_sub
    lookup tables are literal arrays, the score is m_sub element_at calls
    summed inside whole-stage codegen, and top-k is TakeOrderedAndProject.
    Never touches raw vectors: at 10^12 rows this reads only the code
    bytes."""
    dt = pq_adc_tables(query_vec, codebooks)
    adc = F.lit(0.0)
    for m in range(dt.shape[0]):
        tab = F.array(*[F.lit(float(x)) for x in dt[m]])
        adc = adc + F.element_at(tab, F.element_at("codes", m + 1) + 1)
    return (codes_df.select(F.col(id_col), adc.alias("adc"))
            .orderBy(F.asc("adc"), F.asc(id_col))
            .limit(k))


class PqVectorIndex:
    """Persisted PQ index: codebooks trained once, the corpus stored as the
    codes table (m_sub ints per vector — the ~64x-smaller scan at dim=64 /
    m_sub=4 vs raw float32), queries scored by ADC lookups. Optional exact
    re-rank (``rerank > 0``) joins only the ADC shortlist back to the raw
    embeddings — the standard two-stage serving shape (PQ screens, exact
    cosine orders the survivors). Codebook sidecar uses the IVF pattern
    (underscore-prefixed file Spark's parquet discovery ignores)."""

    def __init__(self, path: str, dim: int, m_sub: int = 4,
                 n_centroids: int = 8, n_iters: int = 2, seed: str = "pq",
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.path = path
        self.dim = dim
        self.m_sub = m_sub
        self.n_centroids = n_centroids
        self.n_iters = n_iters
        self.seed = seed
        self.id_col = id_col
        self.vec_col = vec_col
        self._df = None
        self._cb = None

    @property
    def _cb_path(self) -> str:
        import os
        return os.path.join(self.path, "_pq_codebooks.parquet")

    @classmethod
    def build(cls, emb_df: DataFrame, path: str, dim: int, m_sub: int = 4,
              n_centroids: int = 8, n_iters: int = 2, seed: str = "pq",
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> "PqVectorIndex":
        idx = cls(path, dim, m_sub, n_centroids, n_iters, seed,
                  id_col, vec_col)
        cb = pq_train(emb_df, dim, m_sub, n_centroids, n_iters, seed,
                      id_col, vec_col)
        (pq_encode(emb_df, cb, id_col, vec_col)
         .write.mode("overwrite").parquet(path))
        m, K, dsub = cb.shape
        pd.DataFrame({
            "sub": np.repeat(np.arange(m, dtype=np.int32), K),
            "cid": np.tile(np.arange(K, dtype=np.int32), m),
            "carr": [cb[i, j].tolist() for i in range(m) for j in range(K)],
        }).to_parquet(idx._cb_path, index=False)
        idx._cb = cb
        return idx

    def codebooks(self) -> np.ndarray:
        if self._cb is None:
            pdf = (pd.read_parquet(self._cb_path)
                   .sort_values(["sub", "cid"]))
            dsub = self.dim // self.m_sub
            self._cb = np.stack(
                pdf["carr"].map(lambda c: np.asarray(c, dtype=np.float64))
            ).reshape(self.m_sub, self.n_centroids, dsub)
        return self._cb

    def _read(self, spark) -> DataFrame:
        if self._df is None:
            self._df = spark.read.parquet(self.path)
        return self._df

    def topk(self, spark, query_vec, k: int = 10) -> DataFrame:
        qv = np.asarray(query_vec, dtype=np.float64)
        if qv.size != self.dim:
            raise ValueError(f"query dim {qv.size} != index dim {self.dim}")
        return pq_adc_topk(self._read(spark), query_vec, self.codebooks(),
                           k, self.id_col)

    def topk_rerank(self, spark, emb_df: DataFrame, query_vec, k: int = 10,
                    rerank: int = 100) -> DataFrame:
        """Two-stage: ADC shortlist of ``rerank`` candidates, then exact
        cosine over only those raw vectors (a k-bounded semi-join against
        the embedding table — the only stage that touches raw floats)."""
        short = self.topk(spark, query_vec, k=max(k, rerank)).select(
            self.id_col)
        cand = emb_df.join(F.broadcast(short), self.id_col)
        return cosine_topk(cand, query_vec, k, self.id_col, self.vec_col)


def batch_quantized_topk(emb_df: DataFrame, query_vecs, k: int = 10, *,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Batched multi-query vector search from ONE corpus scan — the
    query-log-replay shape (the ``search_many`` analogue for vectors):
    all Q query vectors score every partition in a single Arrow pass,
    each partition emits only its per-query local top-k, and one BOUNDED
    window (Q x partitions x k rows) ranks the global per-query top-k.
    The corpus is read once however many queries ride along.

    Exactness: vectors quantize to ``floor(v * 4096)`` int codes (the
    maxsim/MMR precedent) and scores are int64 dots — numpy integer
    matmul is exact, the (score DESC, id ASC) order total, so results
    are bit-identical to any per-query engine and hash-exact in SQL.

    Output: (q_idx, vec_id, qscore, rank), ordered (q_idx, rank).
    """
    if not query_vecs:
        raise ValueError("batch needs >= 1 query vector")
    qm = np.floor(np.asarray(query_vecs, dtype=np.float64)
                  * 4096.0).astype(np.int64)
    nq, dim = qm.shape
    kk = int(k)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.floor(np.stack(pdf[vec_col].values).astype(np.float64)
                         * 4096.0).astype(np.int64)
            if v.shape[1] != dim:
                raise ValueError(f"dim {v.shape[1]} != query dim {dim}")
            ids = pdf[id_col].to_numpy()
            s = v @ qm.T                      # (n, Q) exact int64
            out_q, out_i, out_s = [], [], []
            for qi in range(nq):
                col = s[:, qi]
                order = np.lexsort((ids, -col))[:kk]
                out_q.append(np.full(len(order), qi, dtype=np.int32))
                out_i.append(ids[order])
                out_s.append(col[order])
            yield pd.DataFrame({
                "q_idx": np.concatenate(out_q),
                id_col: np.concatenate(out_i),
                "qscore": np.concatenate(out_s)})

    from pyspark.sql.window import Window
    local = emb_df.select(id_col, vec_col).mapInPandas(
        kernel, f"q_idx int, {id_col} long, qscore long")
    w = Window.partitionBy("q_idx").orderBy(F.desc("qscore"),
                                            F.asc(id_col))
    return (local.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= kk)
            .select("q_idx", id_col, "qscore",
                    F.col("rank").cast("int").alias("rank"))
            .orderBy("q_idx", "rank"))


def batch_quantized_topk_sql(src: str, query_ids: list[int], k: int = 10,
                             dim: int = 64) -> str:
    """DuckDB twin: per query-id arm, the same floor(v*4096) codes and
    int64 dots over the non-query rows, ranked (score DESC, id ASC) and
    cut at k; arms UNION ALL'd in q_idx order."""
    qlist = ", ".join(str(q) for q in query_ids)
    code = ("list_transform({col}, x -> "
            "CAST(floor(CAST(x AS DOUBLE) * 4096.0) AS BIGINT))")
    dot = (f"list_sum(list_transform(range(1, {dim} + 1), "
           f"j -> c[j] * qc[j]))::BIGINT")
    arms = []
    for qi, qid in enumerate(query_ids):
        arms.append(f"""
  SELECT {qi} AS q_idx, vec_id, qscore,
         CAST(row_number() OVER (ORDER BY qscore DESC, vec_id) AS INT)
         AS rank
  FROM (
    SELECT b.vec_id, {dot} AS qscore
    FROM (SELECT vec_id, {code.format(col='embedding')} AS c
          FROM {src} WHERE vec_id NOT IN ({qlist})) b,
         (SELECT {code.format(col='embedding')} AS qc
          FROM {src} WHERE vec_id = {qid}) q
  )
  QUALIFY rank <= {k}""")
    return ("SELECT * FROM (" + "\n  UNION ALL\n".join(arms)
            + "\n) ORDER BY q_idx, rank")
