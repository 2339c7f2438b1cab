"""KMV (k-minimum-values) distinct-count sketch — deterministic and
oracle-replicable.

The cardinality sketch a 100 TB pipeline wants for "distinct urls per
domain / distinct shingles per shard" style questions without a full
count(DISTINCT) shuffle of the values: hash every value to a uniform
60-bit point, keep only the k smallest hashes per group, and estimate
|distinct| from how densely the minima pack the hash space
(Bar-Yossef et al. 2002): ``est = (k-1) * SPACE / h_(k)``. Groups with
fewer than k distinct hashes report the exact count (the sketch IS the
distinct set there).

Why KMV and not HyperLogLog here: the estimator consumes ONE scalar (the
k-th minimum) instead of a 2^p-register harmonic mean, so the whole
estimate is a single deterministic float expression — bit-replicable by
the DuckDB oracle with no float-summation-order caveats — and the state
(the k minima) is trivially mergeable: union the sets, keep the k
smallest (``kmv_merge_states``), which is how shard-level sketches
combine on a tree without touching rows again.

Hashing is the engine's md5-60bit primitive (``sampling.bucket_col``'s
space, SQL twin ``sqlhash.md5_bucket60`` with the identity modulus), so
estimates are independent of partitioning, engine, and row order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_SPACE = 1 << 60

__all__ = ["kmv_hash_col", "kmv_distinct_df", "kmv_state_df",
           "kmv_merge_states"]


def kmv_hash_col(value_col: str | Column, seed: str = "kmv") -> Column:
    """Uniform 60-bit hash point of the value (JVM md5/conv, no Python)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(seed), v.cast("string"))), 1, 15), 16, 10).cast("long")


def kmv_distinct_df(df: DataFrame, group_col: str, value_col: str,
                    k: int = 256, seed: str = "kmv") -> DataFrame:
    """(``group_col``, n_kept, est_distinct): estimated distinct
    ``value_col`` per group. ``n_kept`` = min(k, distinct hashes) — when
    it is < k the estimate is exact by construction.

    Scale shape: one (group, hash) distinct aggregation, then a window
    rank that only ever ranks up to k rows per group after the partial
    top-k pushes down; the estimator itself is a scalar expression.
    """
    hashes = (df.select(F.col(group_col).alias("g"),
                        kmv_hash_col(value_col, seed).alias("h"))
              .distinct())
    w = Window.partitionBy("g").orderBy(F.asc("h"))
    ranked = (hashes.withColumn("r", F.row_number().over(w))
              .filter(F.col("r") <= k))
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.floor(F.lit(float((k - 1) * _SPACE))
                        / F.col("kth").cast("double")).cast("double"))
    return (ranked.groupBy("g")
            .agg(F.count("*").alias("n_kept"),
                 F.max(F.when(F.col("r") == k, F.col("h"))).alias("kth"))
            .select(F.col("g").alias(group_col), "n_kept",
                    est.cast("long").alias("est_distinct"))
            .orderBy(group_col))


def kmv_state_df(df: DataFrame, group_col: str, value_col: str,
                 k: int = 256, seed: str = "kmv") -> DataFrame:
    """(``group_col``, minima: array<long>) — the mergeable sketch state
    (the k smallest distinct hash points per group, ascending)."""
    hashes = (df.select(F.col(group_col).alias("g"),
                        kmv_hash_col(value_col, seed).alias("h"))
              .distinct())
    w = Window.partitionBy("g").orderBy(F.asc("h"))
    return (hashes.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= k)
            .groupBy("g")
            .agg(F.sort_array(F.collect_list("h")).alias("minima"))
            .select(F.col("g").alias(group_col), "minima"))


def kmv_merge_states(a: DataFrame, b: DataFrame, group_col: str,
                     k: int = 256) -> DataFrame:
    """Union two sketch states: per group, distinct-union the minima and
    keep the k smallest — the tree-combine step for shard-level sketches.
    Estimating from the merged state equals sketching the unioned rows."""
    both = a.unionByName(b)
    return (both.select(group_col, F.explode("minima").alias("h"))
            .distinct()
            .withColumn("r", F.row_number().over(
                Window.partitionBy(group_col).orderBy(F.asc("h"))))
            .filter(F.col("r") <= k)
            .groupBy(group_col)
            .agg(F.sort_array(F.collect_list("h")).alias("minima")))
