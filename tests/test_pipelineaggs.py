"""ES pipeline aggregations (fatespark.pipelineaggs): date_histogram +
derivative / cumulative_sum / moving_fn against a hand-computed trace,
gap-bucket materialization, and the DuckDB twin."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fatespark.pipelineaggs import (date_histogram_pipeline,
                                    date_histogram_pipeline_sql)


def _mk(spark, days):
    """events df with `days[i]` rows on 2024-01-(i+1) (0 = gap day)."""
    rows = []
    for i, n in enumerate(days):
        base = dt.datetime(2024, 1, 1 + i)
        for j in range(n):
            rows.append((base + dt.timedelta(minutes=j),))
    return spark.createDataFrame(rows, "ts timestamp")


class TestPipeline:
    def test_hand_trace_with_gap(self, spark):
        # day counts 3, 0(gap), 2, 5 -> gap bucket materialized as 0
        df = _mk(spark, [3, 0, 2, 5])
        out = date_histogram_pipeline(df, "ts", window=2).collect()
        assert [r["n"] for r in out] == [3, 0, 2, 5]
        assert [r["deriv"] for r in out] == [None, -3.0, 2.0, 3.0]
        assert [r["cum"] for r in out] == [3, 3, 5, 10]
        # moving avg over the 2 buckets BEFORE current (ES shift=0)
        assert out[0]["mavg"] is None
        assert out[1]["mavg"] == 3.0
        assert out[2]["mavg"] == 1.5
        assert out[3]["mavg"] == 1.0
        assert [r["bucket"].day for r in out] == [1, 2, 3, 4]

    def test_min_doc_count_1_drops_gap(self, spark):
        df = _mk(spark, [3, 0, 2])
        out = date_histogram_pipeline(df, "ts", window=2,
                                      min_doc_count=1).collect()
        assert [r["n"] for r in out] == [3, 2]
        assert [r["deriv"] for r in out] == [None, -1.0]

    def test_min_doc_count_2_omits_small_buckets(self, spark):
        # ES omits buckets with doc_count < min_doc_count; the pipeline
        # functions run over the surviving sparse sequence
        import duckdb
        df = _mk(spark, [3, 1, 4, 2, 5])
        out = date_histogram_pipeline(df, "ts", window=2,
                                      min_doc_count=3).collect()
        assert [r["n"] for r in out] == [3, 4, 5]
        assert [r["deriv"] for r in out] == [None, 1.0, 1.0]
        assert [r["cum"] for r in out] == [3, 7, 12]
        con = duckdb.connect()
        con.register("events", df.toPandas())
        want = [tuple(r) for r in con.execute(
            date_histogram_pipeline_sql("events", "ts", window=2,
                                        min_doc_count=3)).fetchall()]
        def norm(rows):   # bucket may come back date vs datetime
            import datetime as _dt
            return [(_dt.date(b.year, b.month, b.day), *rest)
                    for b, *rest in rows]
        assert norm([tuple(r) for r in out]) == norm(want)

    def test_duckdb_twin_parity(self, spark):
        import duckdb
        df = _mk(spark, [4, 1, 0, 0, 7, 2])
        got = [tuple(r) for r in
               date_histogram_pipeline(df, "ts", window=3).collect()]
        con = duckdb.connect()
        con.register("events", df.toPandas())
        want = [tuple(r) for r in con.execute(
            date_histogram_pipeline_sql("events", "ts",
                                        window=3)).fetchall()]
        def norm(rows):
            return [(b, n, d, c,
                     None if m is None else round(m, 12))
                    for b, n, d, c, m in rows]
        assert norm(got) == norm(want) and got
        # exact float equality on mavg too (int sum / int count division)
        assert [r[4] for r in got] == [r[4] for r in want]

    def test_hour_interval(self, spark):
        rows = [(dt.datetime(2024, 1, 1, h, 30),) for h in (0, 0, 2)]
        df = spark.createDataFrame(rows, "ts timestamp")
        out = date_histogram_pipeline(df, "ts",
                                      interval="hour").collect()
        assert [r["n"] for r in out] == [2, 0, 1]

    def test_validation(self, spark):
        df = _mk(spark, [1])
        with pytest.raises(ValueError):
            date_histogram_pipeline(df, "ts", interval="fortnight")
        with pytest.raises(ValueError):
            date_histogram_pipeline(df, "ts", window=0)
        with pytest.raises(ValueError):
            date_histogram_pipeline_sql("events", "ts",
                                        interval="fortnight")

    def test_serial_diff(self, spark):
        df = _mk(spark, [3, 1, 4, 1, 5, 9])
        out = date_histogram_pipeline(df, "ts", serial_diff=2).collect()
        # n - lag(n, 2): nulls for the first two buckets
        assert [r["sdiff"] for r in out] == \
            [None, None, 1.0, 0.0, 1.0, 8.0]
        # period 1 coincides with the derivative
        out1 = date_histogram_pipeline(df, "ts", serial_diff=1).collect()
        assert [r["sdiff"] for r in out1] == [r["deriv"] for r in out1]
        with pytest.raises(ValueError):
            date_histogram_pipeline(df, "ts", serial_diff=0)
