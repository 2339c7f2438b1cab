"""Deterministic sampling and split assignment for training-data pipelines.

A 100 TB corpus feeding model training needs three operations that CANNOT
use Spark's built-in randomized sampling (`df.sample`/`sampleBy` draw from
a per-partition RNG stream, so results change with partitioning, task
retries, and cluster size):

- ``assign_splits``: stable train/val/test assignment per document;
- ``stratified_sample``: per-stratum keep fractions (e.g. downsample a
  dominant language) that are reproducible run-to-run;
- ``shuffle_order_col``: a reproducible global shuffle key for training
  order, decoupled from storage order.

All three derive from one primitive: ``bucket_col`` hashes
``seed ':' key`` with md5 and keeps the first 60 bits (15 hex nibbles —
fits a signed BIGINT, so the same value is computable in ANSI SQL and the
DuckDB driver oracles replicate assignments bit-exactly; see
``sqlhash.md5_bucket60``). Membership depends only on (seed, key), never on
partitioning or row order, so a document keeps its split across reruns,
repartitions, incremental appends, and engines — the property training
pipelines actually need (no test-set leakage when the corpus is rebuilt).
Everything is built-in JVM expressions: no UDF, no shuffle beyond what the
caller aggregates.

Reference analogue: none (fates has no sampling surface); target-new for
the training-data pipeline per the survey's LLM-data ops mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 60-bit hash space (15 hex nibbles of md5)
_SPACE = 1 << 60


def bucket_col(key_col: str | Column, seed: str = "split",
               buckets: int = 1_000_000) -> Column:
    """Deterministic bucket in [0, buckets) from md5(seed ':' key) — the
    first 60 md5 bits scaled down by modulo. Pure JVM (`md5`/`conv`), so it
    whole-stage-codegens and pushes through any plan; bit-equal to the
    DuckDB twin ``sqlhash.md5_bucket60``."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(seed), key.cast("string"))), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def shuffle_order_col(key_col: str | Column, seed: str = "shuffle") -> Column:
    """Reproducible global-shuffle sort key: orderBy this (plus the key as
    a tiebreak) to get a training order independent of storage layout.
    At scale this is ONE range-partitioned sort — exactly what a
    write-shuffled-shards job wants."""
    return bucket_col(key_col, seed=seed, buckets=_SPACE)


def assign_splits(df: DataFrame, weights: dict[str, float],
                  key_col: str = "doc_id", seed: str = "split",
                  out_col: str = "split") -> DataFrame:
    """Add a stable split label per row. ``weights`` maps label -> fraction
    (must sum to ~1); labels take contiguous bucket ranges in the given
    order, so enlarging one split later only moves rows across ONE
    boundary. Per-million granularity."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights sum to {total}, expected 1")
    b = bucket_col(key_col, seed=seed, buckets=1_000_000)
    expr = None
    hi = 0
    items = list(weights.items())
    for label, w in items[:-1]:
        hi += int(round(w * 1_000_000))
        cond = b < hi
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float], default: float = 0.0,
                      key_col: str = "doc_id",
                      seed: str = "sample") -> DataFrame:
    """Keep each row with its stratum's fraction, deterministically:
    row survives iff bucket(key) < fraction(stratum) * 1e6. Unlike
    ``DataFrame.sampleBy`` this is exact-by-key (same rows every run, any
    cluster), and the filter is a JVM predicate that pushes into the scan's
    whole-stage codegen — a full-corpus downsample never shuffles at all."""
    b = bucket_col(key_col, seed=seed, buckets=1_000_000)
    thr = None
    for val, frac in fractions.items():
        cut = int(round(frac * 1_000_000))
        cond = F.col(strata_col) == val
        thr = F.when(cond, cut) if thr is None else thr.when(cond, cut)
    thr = (F.lit(int(round(default * 1_000_000))) if thr is None
           else thr.otherwise(int(round(default * 1_000_000))))
    return df.filter(b < thr)
