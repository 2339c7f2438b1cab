"""Event-time windowed counts with watermark: late-data semantics.

Pins the exact Structured Streaming contract the st_windowed_counts oracle
encodes (two-watermark semantics, SPARK-40925):

- the LATE-RECORD filter for micro-batch N uses the watermark in effect
  during batch N-1 (max event time over batches 0..N-2 minus the delay) —
  so batch 1 is never filtered (initial watermark is epoch);
- the filter drops a row iff its WINDOW END <= that watermark (window
  bound, not the row timestamp: a row older than the watermark whose
  window is still open is merged);
- state EVICTION uses the current watermark, and update-mode emissions
  are cumulative per window, so max(n_events) per window equals the batch
  recompute over the kept rows.
"""

import time
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fatespark.streaming import streaming_windowed_counts


def _run_stream(spark, tmp_root, batches, window="1 day", watermark="2 days"):
    run = uuid.uuid4().hex[:6]
    src = str(tmp_root / f"stw_{run}_src")
    ckpt = str(tmp_root / f"stw_{run}_ckpt")
    schema = "event_id long, ts timestamp"
    for rows in batches:
        (spark.createDataFrame(rows, schema).coalesce(1)
         .write.mode("append").parquet(src))
        time.sleep(1.05)   # distinct mtimes -> deterministic batch order
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = streaming_windowed_counts(stream, ts_col="ts", window=window,
                                    watermark=watermark)
    name = f"stw_{run}"
    sq = (out.writeStream.format("memory").queryName(name)
          .outputMode("update").option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    sq.awaitTermination(300)
    got = (spark.table(name).groupBy("win_start")
           .agg(F.max("n_events").alias("n")).orderBy("win_start").collect())
    return {str(r["win_start"])[:10]: r["n"] for r in got}


def _ts(s):
    return pd.Timestamp(s).to_pydatetime()


def test_batch1_never_filtered(spark, tmp_root):
    """Batch 1's late filter uses batch-0's watermark (epoch): rows far
    below the new watermark still merge into live state."""
    b0 = [(1, _ts("2024-01-01 06:00")), (2, _ts("2024-01-10 12:00"))]
    b1 = [(3, _ts("2024-01-01 07:00"))]   # 9 days late vs wm after b0
    got = _run_stream(spark, tmp_root, [b0, b1])
    assert got["2024-01-01"] == 2   # merged, not dropped
    assert got["2024-01-10"] == 1


def test_batch2_drops_on_window_end_not_row_ts(spark, tmp_root):
    """Batch 2's filter uses the watermark from batch 0's max event time;
    a row with ts below the watermark but window end above it is KEPT."""
    b0 = [(1, _ts("2024-01-10 18:30"))]           # wm -> Jan 8 18:30
    b1 = [(2, _ts("2024-01-10 19:00"))]           # advances nothing binding
    b2 = [(3, _ts("2024-01-05 01:00")),           # window end Jan 6 <= wm: DROP
          (4, _ts("2024-01-08 06:00")),           # ts < wm but window end
                                                  # Jan 9 > wm: KEEP
          (5, _ts("2024-01-10 02:00"))]           # on-time: KEEP
    got = _run_stream(spark, tmp_root, [b0, b1, b2])
    assert "2024-01-05" not in got                # dropped whole window
    assert got["2024-01-08"] == 1                 # window-end rule
    assert got["2024-01-10"] == 3


def test_update_counts_are_cumulative(spark, tmp_root):
    b0 = [(1, _ts("2024-01-10 10:00")), (2, _ts("2024-01-10 11:00"))]
    b1 = [(3, _ts("2024-01-10 12:00"))]
    got = _run_stream(spark, tmp_root, [b0, b1])
    assert got["2024-01-10"] == 3


def test_events_fixture_shape(spark, tmp_root):
    """The driver split on the events table: three batches, very-late
    tail dropped — final equals the batch recompute over kept rows."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("event_id", "ts")
    b0 = ev.filter((F.col("event_id") % 4).isin(1, 2))
    b1 = ev.filter(F.col("event_id") % 4 == 3)
    b2 = ev.filter(F.col("event_id") % 4 == 0)
    rows = [[(r["event_id"], r["ts"]) for r in b.collect()]
            for b in (b0, b1, b2)]
    got = _run_stream(spark, tmp_root, rows)
    p0, p1, p2 = [b.toPandas() for b in (b0, b1, b2)]
    wm = p0.ts.max() - pd.Timedelta(days=2)
    wend = p2.ts.dt.floor("D") + pd.Timedelta(days=1)
    kept = pd.concat([p0, p1, p2[wend > wm]])
    want = kept.assign(w=kept.ts.dt.floor("D").dt.strftime("%Y-%m-%d")) \
        .groupby("w").size().to_dict()
    assert got == want
    assert (wend <= wm).sum() > 0   # the drop path is exercised


def test_keyed_windows_trending(spark, tmp_root):
    """key_col grouping: per-(window, key) counts under the same
    watermark contract; the trending top-k post-pass ranks by
    (n DESC, key ASC)."""
    run = uuid.uuid4().hex[:6]
    src = str(tmp_root / f"stk_{run}_src")
    ckpt = str(tmp_root / f"stk_{run}_ckpt")
    schema = "event_id long, ts timestamp, k string"
    b0 = [(1, _ts("2024-01-05 10:00"), "a"),
          (2, _ts("2024-01-05 11:00"), "a"),
          (3, _ts("2024-01-05 12:00"), "b")]
    b1 = [(4, _ts("2024-01-05 13:00"), "b"),
          (5, _ts("2024-01-05 14:00"), "b")]
    # batch 2 is filtered by the watermark in effect during batch 1
    # (max batch-0 event time - 2 days = 01-03 12:00): the 'z' row's
    # window END 01-02 is <= it -> dropped
    b2 = [(6, _ts("2024-01-01 09:00"), "z")]
    for rows in (b0, b1, b2):
        (spark.createDataFrame(rows, schema).coalesce(1)
         .write.mode("append").parquet(src))
        time.sleep(1.05)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = streaming_windowed_counts(stream, ts_col="ts", key_col="k",
                                    window="1 day", watermark="2 days")
    name = f"stk_{run}"
    sq = (out.writeStream.format("memory").queryName(name)
          .outputMode("update").option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    sq.awaitTermination(300)
    got = {(str(r["win_start"])[:10], r["k"]): r["n"] for r in
           (spark.table(name).groupBy("win_start", "k")
            .agg(F.max("n_events").alias("n")).collect())}
    # the late 'z' row (closed window) is dropped; a/b keyed counts kept
    assert got == {("2024-01-05", "a"): 2, ("2024-01-05", "b"): 3}
