"""ES pipeline aggregations over a ``date_histogram``: ``derivative``,
``cumulative_sum``, ``moving_fn`` — the dashboard staple ("daily event
counts, day-over-day delta, running total, trailing average").

Semantics follow ES:

- ``date_histogram`` buckets by ``date_trunc(interval)``; with
  ``min_doc_count=0`` (the ES default) EMPTY buckets between the first
  and last are materialized with count 0 (a gap would otherwise corrupt
  the derivative), via one 2-scalar min/max agg + an exploded timestamp
  ``sequence`` left-joined to the counts — no corpus-sized generate.
  ``min_doc_count>=2`` OMITS buckets with fewer docs (the ES contract);
  the pipeline functions then run over the surviving sparse sequence.
- ``derivative`` — ``n - lag(n)``; null for the first bucket (ES emits
  no derivative there).
- ``cumulative_sum`` — running total, first bucket included.
- ``moving_fn`` (unweighted avg, the ES example fn) with the ES default
  ``shift=0``: the window is the ``window`` buckets strictly BEFORE the
  current one; null while the frame is empty. The frame's sum and count
  are exact integers, so the single division is deterministic and the
  float hash-compares cross-engine.

Scale shape: the per-bucket count is one map-side-combinable hash agg
(the only corpus-sized stage). The pipeline functions run in ONE window
over the bucket rows; that window is single-partition BY DESIGN — its
input is bounded by time-horizon / interval (a decade of days is ~3.7k
rows), the ``quality_tiers`` CDF precedent, never corpus-sized. Output
is one row per bucket.

Reference analogue: none (fates has no aggregations) — target-new, the
ES pipeline-aggregation surface next to ``composite.py``/``bucketaggs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["date_histogram_pipeline", "date_histogram_pipeline_sql"]

_INTERVALS = {"hour": "interval 1 hour", "day": "interval 1 day",
              "week": "interval 1 week", "month": "interval 1 month"}


def date_histogram_pipeline(df: DataFrame, ts_col: str = "ts", *,
                            interval: str = "day", window: int = 3,
                            min_doc_count: int = 0,
                            serial_diff: int | None = None) -> DataFrame:
    """(bucket, n, deriv, cum, mavg) per ``interval`` bucket of
    ``ts_col``, ordered by bucket (module docstring). With
    ``serial_diff=p`` an ``sdiff`` column adds the ES ``serial_diff``
    pipeline agg — ``n - lag(n, p)``, the period-lagged difference that
    removes seasonality of period p (null for the first p buckets);
    ``serial_diff=1`` coincides with ``deriv`` by construction."""
    if interval not in _INTERVALS:
        raise ValueError(f"interval must be one of {sorted(_INTERVALS)}")
    if window < 1:
        raise ValueError("window must be >= 1")
    if serial_diff is not None and serial_diff < 1:
        raise ValueError("serial_diff period must be >= 1")
    counts = (df.select(F.date_trunc(interval, F.col(ts_col))
                        .alias("bucket"))
              .filter(F.col("bucket").isNotNull())
              .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))
    if min_doc_count == 0:
        # materialize gap buckets: 1-row min/max agg -> sequence explode
        span = counts.agg(F.min("bucket").alias("lo"),
                          F.max("bucket").alias("hi"))
        grid = span.select(F.explode(F.sequence(
            "lo", "hi", F.expr(_INTERVALS[interval]))).alias("bucket"))
        counts = (grid.join(counts, "bucket", "left")
                  .select("bucket",
                          F.coalesce("n", F.lit(0)).alias("n")))
    elif min_doc_count > 1:
        # ES omits buckets with doc_count < min_doc_count (the window
        # functions below then run over the SURVIVING bucket sequence,
        # matching ES pipeline aggs over a sparse histogram)
        counts = counts.filter(F.col("n") >= min_doc_count)
    w = Window.orderBy("bucket")
    frame = w.rowsBetween(-window, -1)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    mavg = (F.sum("n").over(frame).cast("double")
            / F.count("n").over(frame).cast("double"))
    out = (counts
           .withColumn("deriv",
                       (F.col("n") - F.lag("n").over(w)).cast("double"))
           .withColumn("cum", F.sum("n").over(cum))
           .withColumn("mavg", mavg))
    if serial_diff is not None:
        out = out.withColumn(
            "sdiff",
            (F.col("n") - F.lag("n", serial_diff).over(w)).cast("double"))
    return out.orderBy("bucket")


def date_histogram_pipeline_sql(src: str, ts_col: str = "ts", *,
                                interval: str = "day", window: int = 3,
                                min_doc_count: int = 0) -> str:
    """DuckDB twin: same truncation, gap fill, frames and the same
    int-sum/int-count division for ``mavg``."""
    if interval not in _INTERVALS:
        raise ValueError(f"interval must be one of {sorted(_INTERVALS)}")
    base = f"""
  SELECT date_trunc('{interval}', {ts_col}) AS bucket, count(*) AS n
  FROM {src} WHERE {ts_col} IS NOT NULL GROUP BY 1"""
    if min_doc_count == 0:
        counts = f"""
counts0 AS ({base}),
grid AS (
  SELECT unnest(generate_series((SELECT min(bucket) FROM counts0),
                                (SELECT max(bucket) FROM counts0),
                                {_INTERVALS[interval].replace('interval ',
                                                             "INTERVAL ")}))
         AS bucket
),
counts AS (
  SELECT g.bucket, coalesce(c.n, 0) AS n
  FROM grid g LEFT JOIN counts0 c USING (bucket)
)"""
    elif min_doc_count > 1:
        counts = (f"counts0 AS ({base}),\n"
                  f"counts AS (SELECT * FROM counts0 "
                  f"WHERE n >= {int(min_doc_count)})")
    else:
        counts = f"counts AS ({base})"
    return f"""
WITH {counts}
SELECT bucket, CAST(n AS BIGINT) AS n,
       CAST(n - lag(n) OVER w AS DOUBLE) AS deriv,
       CAST(sum(n) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum,
       CAST(sum(n) OVER frame AS DOUBLE)
         / CAST(count(n) OVER frame AS DOUBLE) AS mavg
FROM counts
WINDOW w AS (ORDER BY bucket),
       frame AS (ORDER BY bucket
                 ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING)
ORDER BY bucket
"""
