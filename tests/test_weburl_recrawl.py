"""Recrawl version resolution (weburl.recrawl_latest)."""

import pytest
from pyspark.sql import functions as F

from fatespark.weburl import recrawl_latest


@pytest.fixture(scope="module")
def versions(spark):
    rows = [
        # url, ts, text
        ("u1", 100, "alpha"),                 # single crawl
        ("u2", 100, "beta"), ("u2", 200, "beta"),          # unchanged
        ("u3", 100, "gamma"), ("u3", 200, "gamma two"),    # changed
        ("u4", 100, "d0"), ("u4", 200, "d1"), ("u4", 300, "d1"),  # 3 crawls
    ]
    return spark.createDataFrame(rows, "url string, warc_ts long, "
                                       "text string")


class TestRecrawlLatest:
    def test_latest_and_flags(self, versions):
        out = {r["url"]: r for r in recrawl_latest(versions).collect()}
        assert set(out) == {"u1", "u2", "u3", "u4"}
        assert (out["u1"]["n_versions"], out["u1"]["changed"]) == (1, 0)
        assert (out["u2"]["n_versions"], out["u2"]["changed"]) == (2, 0)
        assert (out["u3"]["n_versions"], out["u3"]["changed"]) == (2, 1)
        # u4: latest (300, "d1") vs prev (200, "d1") -> unchanged, even
        # though an earlier transition DID change
        assert (out["u4"]["n_versions"], out["u4"]["changed"]) == (3, 0)
        assert out["u4"]["warc_ts"] == 300 and out["u4"]["text"] == "d1"

    def test_extra_columns_pass_through(self, versions, spark):
        v = versions.withColumn("lang", F.lit("en"))
        out = recrawl_latest(v)
        assert "lang" in out.columns
        assert out.filter("url = 'u3'").collect()[0]["lang"] == "en"
