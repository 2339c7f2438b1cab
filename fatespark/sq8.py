"""Scalar-quantized (int) vector search — the Lucene 9.9 SQ path.

Lucene's ``Lucene99ScalarQuantizedVectorsFormat`` compresses each
float32 vector to one byte per dimension against corpus-level quantiles
and serves approximate top-k with an INTEGER dot product, keeping the
raw vectors around for exact rescoring.  Same shape here, exact where
Lucene is approximate:

- train: global component ``min`` / ``max`` over the searched set (ONE
  2-scalar aggregate; Lucene's confidence-interval quantile collapses
  to min/max at confidence 1.0),
- encode: ``code = clamp(floor((x - min) * levels/(max - min)), 0,
  levels)`` — a narrow JVM ``transform``, levels = 2^bits - 1,
- search: candidate score = int64 dot of code arrays (order-independent
  EXACT integer arithmetic — no float-fold machinery needed), pool =
  top-``pool`` by (qscore DESC, vec_id ASC) via a k-bounded
  TakeOrderedAndProject,
- rerank: exact float cosine over the pool only (the ann_topk
  expressions), final (cosine DESC, vec_id ASC) top-k.

Float determinism: min/max are exact float32 values, cast to double
before any arithmetic in BOTH engines; ``scale = levels / (max - min)``
is one double division; the per-component expression tree is identical
in Spark and the DuckDB twin, so the int codes — and therefore the
int64 candidate scores and the pool membership — are bit-identical
cross-engine.  The rerank reuses the ann_topk cosine convention
(exact-cosine ordering, round-4 reported score).

100 TB shape: train is one all-reduce to 2 scalars; encode is narrow;
the candidate pass scans codes only (1 byte/dim vs 4 — the reason SQ
exists) and keeps ``pool`` rows per partition; rerank touches ``pool``
raw vectors.  Nothing corpus-sized shuffles.

Reference analogue: none (fates is text-only) — target-new, the
vector-serving tier next to LSH/IVF/PQ.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, functions as F

from .ann import _dot, _norm, _qvec_lit

__all__ = ["sq8_stats", "sq8_codes_col", "quantize_query", "sq8_topk",
           "Sq8VectorIndex", "sq8_topk_sql"]


def sq8_stats(emb_df: DataFrame, vec_col: str = "embedding"
              ) -> tuple[float, float]:
    """(min, max) over every component of every vector — exact float32
    values as Python doubles (float32 -> float64 is exact)."""
    r = emb_df.agg(
        F.min(F.array_min(vec_col)).cast("double").alias("mn"),
        F.max(F.array_max(vec_col)).cast("double").alias("mx")).collect()[0]
    if r["mn"] is None:
        raise ValueError("sq8_stats: empty vector set")
    return float(r["mn"]), float(r["mx"])


def _scale(minv: float, maxv: float, bits: int) -> float:
    levels = (1 << bits) - 1
    return 0.0 if maxv == minv else levels / (maxv - minv)


def sq8_codes_col(vec_col, minv: float, maxv: float, bits: int = 7):
    """Int code array column: clamp(floor((x - min) * scale), 0, levels).
    The expression tree mirrors the SQL twin exactly."""
    levels = (1 << bits) - 1
    sc = _scale(minv, maxv, bits)
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        col,
        lambda x: F.least(
            F.lit(levels),
            F.greatest(F.lit(0),
                       F.floor((x.cast("double") - F.lit(minv))
                               * F.lit(sc)).cast("int"))))


def quantize_query(query_vec, minv: float, maxv: float,
                   bits: int = 7) -> list[int]:
    """Driver-side twin of sq8_codes_col for the query vector (same
    double ops in the same order)."""
    levels = (1 << bits) - 1
    sc = _scale(minv, maxv, bits)
    return [min(levels, max(0, math.floor((float(x) - minv) * sc)))
            for x in query_vec]


def _int_dot(codes, qcodes: list[int]):
    qarr = F.array(*[F.lit(int(c)) for c in qcodes])
    return F.aggregate(
        F.zip_with(codes, qarr, lambda a, b: a.cast("long") * b),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def sq8_topk(emb_df: DataFrame, query_vec, k: int = 10, *,
             pool: int = 50, bits: int = 7, id_col: str = "vec_id",
             vec_col: str = "embedding",
             stats: tuple[float, float] | None = None) -> DataFrame:
    """(vec_id, qscore, cosine) — int8-SQ candidate top-``pool`` reranked
    by exact cosine to the final top-``k``.  ``stats`` pins (min, max)
    when serving from a persisted index; default trains on ``emb_df``."""
    if pool < k:
        raise ValueError("pool must be >= k")
    minv, maxv = stats if stats is not None else sq8_stats(emb_df, vec_col)
    qcodes = quantize_query(query_vec, minv, maxv, bits)
    cand = (emb_df.select(
                F.col(id_col), F.col(vec_col),
                _int_dot(sq8_codes_col(vec_col, minv, maxv, bits),
                         qcodes).alias("qscore"))
            .orderBy(F.desc("qscore"), F.asc(id_col))
            .limit(pool))
    qv = _qvec_lit(query_vec)
    v = F.col(vec_col).cast("array<double>")
    cos = _dot(v, qv) / (_norm(v) * _norm(qv))
    return (cand.select(F.col(id_col), "qscore", cos.alias("_c"))
            .orderBy(F.desc("_c"), F.asc(id_col)).limit(k)
            .select(id_col, "qscore", F.round("_c", 4).alias("cosine")))


class Sq8VectorIndex:
    """Persisted SQ index: a codes+raw parquet table plus the frozen
    (min, max) training stats — Lucene keeps raw vectors next to the
    quantized ones for exact rescoring, so does this.  The candidate
    scan reads (id, codes) only; rerank reads raw vectors for the pool
    via the same table (column-pruned scans either way)."""

    def __init__(self, path: str, dim: int, bits: int = 7):
        self.path, self.dim, self.bits = path, dim, bits
        with open(os.path.join(path, "_sq8_meta.json")) as f:
            m = json.load(f)
        self.minv, self.maxv = float(m["min"]), float(m["max"])

    @classmethod
    def build(cls, emb_df: DataFrame, path: str, dim: int, *,
              bits: int = 7, id_col: str = "vec_id",
              vec_col: str = "embedding") -> "Sq8VectorIndex":
        minv, maxv = sq8_stats(emb_df, vec_col)
        (emb_df.select(F.col(id_col).alias("vec_id"),
                       sq8_codes_col(vec_col, minv, maxv, bits)
                       .alias("codes"),
                       F.col(vec_col).alias("embedding"))
         .write.mode("overwrite").parquet(os.path.join(path, "codes")))
        with open(os.path.join(path, "_sq8_meta.json"), "w") as f:
            json.dump({"min": minv, "max": maxv, "bits": bits,
                       "dim": dim}, f)
        return cls(path, dim, bits=bits)

    def topk(self, spark, query_vec, k: int = 10,
             pool: int = 50) -> DataFrame:
        t = spark.read.parquet(os.path.join(self.path, "codes"))
        qcodes = quantize_query(query_vec, self.minv, self.maxv, self.bits)
        cand = (t.select("vec_id", "embedding",
                         _int_dot(F.col("codes"), qcodes).alias("qscore"))
                .orderBy(F.desc("qscore"), F.asc("vec_id")).limit(pool))
        qv = _qvec_lit(query_vec)
        v = F.col("embedding").cast("array<double>")
        cos = _dot(v, qv) / (_norm(v) * _norm(qv))
        return (cand.select("vec_id", "qscore", cos.alias("_c"))
                .orderBy(F.desc("_c"), F.asc("vec_id")).limit(k)
                .select("vec_id", "qscore",
                        F.round("_c", 4).alias("cosine")))


def sq8_topk_sql(src: str, dim: int, *, query_id: int = 0, k: int = 10,
                 pool: int = 50, bits: int = 7,
                 where: str | None = None) -> str:
    """DuckDB twin: same stats, same quantization expression tree, same
    int64 candidate scores, same pool cut, same rerank convention —
    hash-exact.  The query vector is row ``query_id`` of ``src`` and is
    excluded from the searched set (the ann_topk convention).
    ``where`` pre-filters the searched set — the filtered-knn case
    (train stats come from the filtered set too, matching the engine)."""
    levels = (1 << bits) - 1
    qexpr = ("list_transform({col}, x -> least({lv}, greatest(0, "
             "CAST(floor((CAST(x AS DOUBLE) - mind) * scale) AS INT))))")
    extra = f" AND ({where})" if where else ""
    return f"""
WITH base AS (
  SELECT vec_id, embedding FROM {src} WHERE vec_id <> {query_id}{extra}
),
st AS (
  SELECT CAST(min(list_min(embedding)) AS DOUBLE) AS mind,
         CAST(max(list_max(embedding)) AS DOUBLE) AS maxd
  FROM base
),
sc AS (
  SELECT mind,
         CASE WHEN maxd = mind THEN 0.0
              ELSE {float(levels)!r} / (maxd - mind) END AS scale
  FROM st
),
q AS (
  SELECT embedding AS qe, embedding::DOUBLE[] AS qv
  FROM {src} WHERE vec_id = {query_id}
),
qc AS (SELECT {qexpr.format(col="qe", lv=levels)} AS qcodes FROM q, sc),
pool AS (
  SELECT vec_id, embedding,
         list_sum(list_transform(range(1, {dim} + 1),
                  i -> CAST(c[i] AS BIGINT) * qcodes[i]))::BIGINT AS qscore
  FROM (SELECT vec_id, embedding,
               {qexpr.format(col="embedding", lv=levels)} AS c
        FROM base, sc), qc
  ORDER BY qscore DESC, vec_id LIMIT {pool}
)
SELECT vec_id, qscore,
       round(list_cosine_similarity(embedding::DOUBLE[], q.qv), 4) AS cosine
FROM pool, q
ORDER BY list_cosine_similarity(embedding::DOUBLE[], q.qv) DESC, vec_id
LIMIT {k}"""
