"""Sequence packing: assign documents to fixed-token training sequences.

LLM training consumes the corpus as fixed-length context windows ("concat
and chunk", GPT-2/3 style): documents are laid end to end in a canonical
order and the token stream is cut every ``budget`` tokens. The operator
that decides which training sequence(s) each document lands in is a GLOBAL
EXCLUSIVE PREFIX SUM of per-document token counts in that canonical order
— and the naive Spark expression of it, ``sum(n) over (order by doc_id)``,
is a single-partition window at 100 TB (one task sees every row).

``pack_sequences`` computes the same prefix sum scalably, the classic
two-phase scan:

1. ONE range-partition shuffle on the id (`repartitionByRange` +
   `sortWithinPartitions`) puts the corpus in canonical order with
   partition p holding an id range entirely below partition p+1's.
2. A narrow per-partition pass computes each partition's token total —
   P tiny rows collected to the driver.
3. Exclusive per-partition offsets (a P-element cumulative sum on the
   driver) broadcast back as a plain dict, and a second NARROW pass adds
   the partition offset to the within-partition running sum (an ordered
   Arrow fold — integer adds, so any batch boundary gives the same bits).

Total cost: one shuffle of the corpus + two narrow passes; no stage ever
holds more than one partition. The output is invariant to the partition
boundaries the range sampler picks, because offsets are derived from the
actual partition contents (asserted by the boundary-invariance test).

The per-doc output is ``(id, n_tokens, start_off, seq_id, end_seq,
n_seqs)`` where ``seq_id = start_off // budget`` is the first training
sequence the document touches and ``end_seq`` the last (documents longer
than the residual budget straddle sequence boundaries — n_seqs > 1 — which
is exactly what the concat-and-chunk recipe does rather than padding).

Reference analogue: none (fates has no training surface); target-new per
the survey's LLM-data ops mandate. The DuckDB oracle is the single-window
formulation, which is feasible at oracle scale and proves the distributed
scan bit-equal to the textbook definition.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .textops import token_count_col


def pack_sequences(df: DataFrame, budget: int = 2048,
                   id_col: str = "doc_id",
                   tokens_col: "str | Column | None" = None,
                   text_col: str = "text",
                   num_partitions: int | None = None) -> DataFrame:
    """Two-phase distributed scan assigning each doc its training-sequence
    span under ``budget`` tokens per sequence (module docstring). When
    ``tokens_col`` is None the count is the engine's whitespace
    ``token_count_col(text_col)``."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    ntok = (token_count_col(text_col) if tokens_col is None
            else (F.col(tokens_col) if isinstance(tokens_col, str)
                  else tokens_col))
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    base = df.select(F.col(id_col).alias("id"),
                     ntok.cast("long").alias("n_tokens"))
    part = (base.repartitionByRange(num_partitions, "id")
            .sortWithinPartitions("id")
            .withColumn("pid", F.spark_partition_id()))
    # persist: phases 2 and 3 must see the SAME physical partitioning (the
    # range sampler may draw different boundaries on a recompute)
    part = part.persist()
    try:
        totals = (part.groupBy("pid")
                  .agg(F.sum("n_tokens").alias("tot"),
                       F.min("id").alias("lo"))
                  .collect())
    except Exception:
        part.unpersist()
        raise
    totals.sort(key=lambda r: r["lo"])
    offsets: dict[int, int] = {}
    run = 0
    for r in totals:
        offsets[r["pid"]] = run
        run += int(r["tot"])

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry = None  # running total within this (single) partition
        for pdf in batches:
            if not len(pdf):
                continue
            if carry is None:
                carry = offsets.get(int(pdf["pid"].iloc[0]), 0)
            n = pdf["n_tokens"].to_numpy()
            start = n.cumsum() - n + carry
            carry += int(n.sum())
            out = pd.DataFrame({"id": pdf["id"], "n_tokens": pdf["n_tokens"],
                                "start_off": start})
            yield out

    scanned = part.mapInPandas(
        scan, "id long, n_tokens long, start_off long")
    b = F.lit(budget)
    seq = (F.col("start_off") / b).cast("long")
    # an empty doc occupies no tokens: it is pinned to the sequence its
    # offset falls in (end_seq == seq_id, n_seqs == 1)
    last = F.greatest(F.col("start_off") + F.col("n_tokens") - 1,
                      F.col("start_off"))
    end_seq = (last / b).cast("long")
    out = scanned.select(
        F.col("id"), "n_tokens", "start_off",
        seq.alias("seq_id"), end_seq.alias("end_seq"),
        (end_seq - seq + 1).cast("long").alias("n_seqs"))
    # materialization note: callers that need `part` gone should trigger
    # the plan before this returns; unpersist here would drop the cache
    # before the lazy plan runs, so we leave lifecycle to the GC hook
    return out


def pack_sequences_sql(budget: int = 2048, table: str = "documents",
                       id_col: str = "doc_id",
                       tokens_sql: str | None = None) -> str:
    """DuckDB twin of ``pack_sequences``: the textbook one-window
    formulation (fine at oracle scale). ``tokens_sql`` defaults to the
    whitespace token count used everywhere else."""
    ws = r"[ \t\n\r\f\v]+"
    if tokens_sql is None:
        tokens_sql = (f"len(list_filter(regexp_split_to_array("
                      f"coalesce(text, ''), '{ws}'), x -> x <> ''))")
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {tokens_sql}::BIGINT AS n_tokens FROM {table}
),
s AS (
  SELECT id, n_tokens,
         coalesce(SUM(n_tokens) OVER (ORDER BY id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS start_off
  FROM t
)
SELECT id AS {id_col}, n_tokens, start_off,
       (start_off // {budget})::BIGINT AS seq_id,
       (greatest(start_off + n_tokens - 1, start_off) // {budget})::BIGINT
         AS end_seq,
       (greatest(start_off + n_tokens - 1, start_off) // {budget}
        - start_off // {budget} + 1)::BIGINT AS n_seqs
FROM s
ORDER BY id"""
