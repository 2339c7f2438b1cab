"""Gap-based sessionization over event streams — the canonical
clickstream/weblog operator at CDN scale.

``sessionize`` assigns each event a per-user session id: a new session
starts when the gap to the previous event (per user, (ts, event_id)
total order) STRICTLY exceeds ``gap_seconds``. The gap compare runs in
exact integer MICROSECONDS (``unix_micros``), not cast-to-seconds
doubles, so the boundary (gap == 1800 s -> same session) can never
disagree with the DuckDB ``epoch_us`` oracle twin.

Scale shape: ONE shuffle on the user key carries both window passes
(lag -> new-session flag -> running sum), and per-(user, session) /
per-user rollups reuse that partitioning — Catalyst chains the
HashAggregates with no further exchange because the grouping keys are
prefixes of the window partition key (plan-asserted in tests). Skewed
power users cost one partition's worth of sorting, bounded by the
busiest user's event count, the same bound any sessionizer has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def sessionize(events: DataFrame, *, gap_seconds: int = 1800,
               ts_col: str = "ts", user_col: str = "user_id",
               order_col: str = "event_id") -> DataFrame:
    """Events + (new_sess, sess_id): sess_id is 1-based per user."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    prev = F.lag(ts_col).over(w)
    new_sess = (prev.isNull() |
                (F.unix_micros(F.col(ts_col).cast("timestamp"))
                 - F.unix_micros(prev.cast("timestamp"))
                 > int(gap_seconds) * 1_000_000)).cast("int")
    return (events.withColumn("new_sess", new_sess)
            .withColumn("sess_id", F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))


def session_stats(events: DataFrame, *, gap_seconds: int = 1800,
                  ts_col: str = "ts", user_col: str = "user_id",
                  order_col: str = "event_id") -> DataFrame:
    """(user, n_sessions, n_events, max_session_events) — all-integer."""
    per_sess = (sessionize(events, gap_seconds=gap_seconds, ts_col=ts_col,
                           user_col=user_col, order_col=order_col)
                .groupBy(user_col, "sess_id").agg(F.count("*").alias("n")))
    return (per_sess.groupBy(user_col)
            .agg(F.count("*").alias("n_sessions"),
                 F.sum("n").alias("n_events"),
                 F.max("n").alias("max_session_events"))
            .orderBy(user_col))
