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


def mixture_sample(df: DataFrame, weights: dict[str, int],
                   token_budget: int, id_col: str = "doc_id",
                   source_col: str = "source",
                   tokens_col: "str | Column | None" = None,
                   text_col: str = "text",
                   seed: str = "mix") -> DataFrame:
    """Source-weighted corpus mixing (the Pile / Dolma recipe): given
    INTEGER mixing weights per source and a total token budget, emit how
    many training copies of each document to take — upsampling
    high-weight/low-volume sources past 1 epoch and downsampling the rest,
    deterministically.

    The whole contract is integer arithmetic, so it is reproducible
    bit-for-bit on any engine (the DuckDB twin ``mixture_sample_sql``):
    per source s with integer weight w_s and actual token count T_s,

      target_s = w_s * token_budget // sum(w)      (tokens wanted)
      epochs_s = target_s // T_s                   (whole passes)
      cut_s    = (target_s % T_s) * 1_000_000 // T_s

    and a doc takes ``epochs_s`` copies plus one more iff its md5 bucket
    (``bucket_col``, the same split/sample primitive) falls below
    ``cut_s`` — a per-doc fractional epoch that needs no RNG and no
    token-level bookkeeping. Sources missing from ``weights`` get 0
    copies; a source with 0 tokens gets 0. Expected sampled tokens per
    source ≈ target_s (exact up to one doc's granularity).

    100 TB shape: ONE tiny per-source aggregate (|sources| rows collected
    — mixing recipes name sources, they don't have millions), the
    (source, epochs, cut) table broadcast back, and the scoring pass is a
    narrow JVM projection that pushes into the scan. No corpus shuffle
    anywhere. Output (id, source, n_tokens, n_copies) for every doc.

    Reference analogue: none (fates has no training surface); target-new
    per the survey's LLM-data ops mandate."""
    from .textops import token_count_col
    for s, w in weights.items():
        if not isinstance(w, int) or w < 0:
            raise ValueError(f"weights must be non-negative ints, got "
                             f"{s!r}: {w!r}")
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("at least one positive weight required")
    ntok = (token_count_col(text_col) if tokens_col is None
            else (F.col(tokens_col) if isinstance(tokens_col, str)
                  else tokens_col))
    base = df.select(F.col(id_col).alias("id"),
                     F.col(source_col).alias("source"),
                     ntok.cast("long").alias("n_tokens"))
    totals = (base.groupBy("source")
              .agg(F.sum("n_tokens").alias("toks")).collect())
    rows = []
    for r in totals:
        w = weights.get(r["source"], 0)
        toks = int(r["toks"] or 0)
        target = w * token_budget // wsum
        if toks <= 0 or target <= 0:
            rows.append((r["source"], 0, 0))
            continue
        rows.append((r["source"], target // toks,
                     (target % toks) * 1_000_000 // toks))
    plan = df.sparkSession.createDataFrame(
        rows, "source string, epochs long, cut long")
    b = bucket_col(F.col("id"), seed=seed, buckets=1_000_000)
    return (base.join(F.broadcast(plan), "source")
            .select("id", "source", "n_tokens",
                    (F.col("epochs")
                     + F.when(b < F.col("cut"), 1).otherwise(0))
                    .cast("long").alias("n_copies")))


def mixture_sample_sql(weight_sql: str, token_budget: int,
                       table: str = "documents", id_col: str = "doc_id",
                       source_col: str = "source",
                       tokens_sql: str | None = None,
                       seed: str = "mix") -> str:
    """DuckDB twin of ``mixture_sample`` for a weight rule expressed in
    SQL over the source name (``weight_sql``, e.g. a CASE or arithmetic
    over ``source``) — every step is the same integer arithmetic, so the
    match is bit-exact."""
    from . import sqlhash as sq
    ws = r"[ \t\n\r\f\v]+"
    if tokens_sql is None:
        tokens_sql = (f"len(list_filter(regexp_split_to_array("
                      f"coalesce(text, ''), '{ws}'), x -> x <> ''))")
    bucket = sq.md5_bucket60("t.id", seed, 1_000_000)
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {source_col} AS source,
         {tokens_sql}::BIGINT AS n_tokens
  FROM {table}
),
st AS (
  SELECT source, sum(n_tokens)::BIGINT AS toks,
         ({weight_sql})::BIGINT AS w
  FROM t GROUP BY source
),
par AS (
  SELECT source, toks,
         (w * {token_budget}) // (SELECT sum(w) FROM st) AS target
  FROM st
),
plan AS (
  SELECT source,
         CASE WHEN toks <= 0 OR target <= 0 THEN 0
              ELSE target // toks END AS epochs,
         CASE WHEN toks <= 0 OR target <= 0 THEN 0
              ELSE (target % toks) * 1000000 // toks END AS cut
  FROM par
)
SELECT t.id AS {id_col}, t.source, t.n_tokens,
       (p.epochs + CASE WHEN {bucket} < p.cut THEN 1 ELSE 0 END)::BIGINT
         AS n_copies
FROM t JOIN plan p USING (source)
ORDER BY {id_col}"""
