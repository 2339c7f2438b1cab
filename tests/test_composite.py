"""Composite agg: full-walk pagination law, after predicate, sources."""

import pytest
from pyspark.sql import functions as F

from fatespark.composite import composite_agg, histogram_source

ROWS = [(i, ["de", "en", "en", "es", "fr"][i % 5], float(i % 7) * 10.0)
        for i in range(50)]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, lang string, v double").cache()


def all_buckets():
    from collections import Counter
    c = Counter((r[1], (r[2] // 25.0) * 25.0) for r in ROWS)
    return sorted(c.items())


def test_single_page_covers_all(df):
    got = [((r["lang"], r["hv"]), r["n"]) for r in composite_agg(
        df, [("lang", "lang"), ("hv", histogram_source("v", 25.0))],
        size=1000).collect()]
    assert got == all_buckets()


def test_pagination_walk_reconstructs_everything(df):
    """Pages of 3, after_key = last row of the previous page — the ES
    client loop. Concatenation equals the full ordered bucket list,
    with no overlap and no gap."""
    srcs = [("lang", "lang"), ("hv", histogram_source("v", 25.0))]
    pages, after = [], None
    while True:
        rows = composite_agg(df, srcs, size=3, after=after).collect()
        if not rows:
            break
        pages.extend(((r["lang"], r["hv"]), r["n"]) for r in rows)
        after = (rows[-1]["lang"], rows[-1]["hv"])
        assert len(rows) <= 3
    assert pages == all_buckets()


def test_after_is_strict(df):
    srcs = [("lang", "lang"), ("hv", histogram_source("v", 25.0))]
    full = all_buckets()
    mid = full[4][0]
    got = [((r["lang"], r["hv"]), r["n"]) for r in composite_agg(
        df, srcs, size=1000, after=mid).collect()]
    assert got == full[5:]


def test_histogram_source_buckets(df):
    rows = df.select("v", histogram_source("v", 25.0).alias("h")).collect()
    for r in rows:
        assert r["h"] == (r["v"] // 25.0) * 25.0
    assert sorted({x["h"] for x in rows}) == [0.0, 25.0, 50.0]


def test_validation(df):
    with pytest.raises(ValueError):
        composite_agg(df, [])
    with pytest.raises(ValueError):
        composite_agg(df, [("lang", "lang")], after=("a", 1))
