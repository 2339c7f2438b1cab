"""Gap-based sessionization: boundary exactness and plan shape."""

import datetime as dt
import io
import contextlib

import pytest
from pyspark.sql import functions as F

from fatespark.sessions import session_stats, sessionize

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, BASE + dt.timedelta(microseconds=us), u)
         for i, (us, u) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long")


def test_gap_boundary_is_strict(spark):
    """gap == exactly 1800 s stays in the SAME session; one microsecond
    more starts a new one — integer-microsecond compare, no float edge."""
    S = 1_000_000
    ev = _ev(spark, [
        (0, 1),
        (1800 * S, 1),            # exactly 1800 s later: same session
        (3600 * S + 1, 1),        # 1800.000001 s later: NEW session
    ])
    got = {r["event_id"]: r["sess_id"] for r in sessionize(ev).collect()}
    assert got == {0: 1, 1: 1, 2: 2}


def test_sessions_are_per_user(spark):
    S = 1_000_000
    ev = _ev(spark, [(0, 1), (10 * S, 2), (7200 * S, 1), (7210 * S, 2)])
    stats = {r["user_id"]: (r["n_sessions"], r["n_events"])
             for r in session_stats(ev).collect()}
    assert stats == {1: (2, 2), 2: (2, 2)}


def test_ts_tie_breaks_by_order_col(spark):
    """Equal timestamps order by event_id — the total order the oracle
    uses; sess assignment must not depend on physical row order."""
    S = 1_000_000
    ev = _ev(spark, [(0, 1), (0, 1), (5000 * S, 1)])
    got = {r["event_id"]: r["sess_id"]
           for r in sessionize(ev).collect()}
    assert got == {0: 1, 1: 1, 2: 2}


def test_native_session_window_parity(spark):
    """Spark's native session_window implements the SAME gap rule as the
    lag/cumsum sessionizer (new session iff gap > duration, transitive
    merge, inclusive at exactly start+gap) — cross-validated per session
    on the events fixture."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    native = {(r["user_id"], r["s"]): r["n"] for r in
              (ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
               .agg(F.count("*").alias("n"))
               .select("user_id", F.unix_micros(
                   F.col("session_window.start")).alias("s"), "n")
               .collect())}
    ours = {(r["user_id"], r["s"]): r["n"] for r in
            (sessionize(ev).groupBy("user_id", "sess_id")
             .agg(F.unix_micros(F.min("ts")).alias("s"),
                  F.count("*").alias("n")).collect())}
    assert native == ours and len(native) > 0


def test_single_shuffle_plan(spark):
    """The rollups reuse the window's user_id partitioning: exactly one
    hash exchange before the final output sort."""
    ev = _ev(spark, [(0, 1), (1, 2)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        session_stats(ev).explain()   # simple mode: inline exchange args
    plan = buf.getvalue()
    assert plan.count("Exchange hashpartitioning") == 1
