"""ES-aggregation compositions: cardinality (HLL over the match set) and
the completion suggester (weighted dictionary range scan)."""

import pytest
from pyspark.sql import functions as F

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_df
from fatespark.query import SearchIndex, facet_cardinality
from fatespark.suggest import complete


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("aggs") / "idx")
    corpus = pages_df(spark, 1000, partitions=4).select(
        F.xxhash64("url").alias("doc_id"), "url", "text").localCheckpoint()
    IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1)).build(
        spark, corpus, id_col="doc_id", build_id="ag")
    return SearchIndex(spark, d), corpus


def test_cardinality_close_to_exact(fixture):
    idx, corpus = fixture
    row = facet_cardinality(idx, corpus, ["smith"], "url",
                            p=12).collect()[0]
    exact = (corpus.filter(F.array_contains(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
        "smith")).select("url").distinct().count())
    # p=12 gives ~1.6% stderr; urls are unique so exact == match count.
    # small-range linear counting makes this essentially exact here
    assert abs(row["est"] - exact) / exact < 0.05
    assert row["n_regs"] + row["v_zero"] == 1 << 12


def test_cardinality_registers_bounded(fixture):
    idx, corpus = fixture
    row = facet_cardinality(idx, corpus, ["the"], "url", p=8).collect()[0]
    assert row["n_regs"] <= 1 << 8


def test_complete_matches_brute(fixture):
    idx, _ = fixture
    got = [(r["term"], r["weight"]) for r in
           complete(idx, "s", n=10, by="cf").collect()]
    stats = {r["term"]: int(r["cf"]) for r in
             idx.terms.filter(F.col("term").startswith("s")).collect()}
    want = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want
    assert got and got[0][1] >= got[-1][1]
    # fold: uppercase prefix completes identically
    assert [(r["term"], r["weight"]) for r in
            complete(idx, "S", n=10).collect()] == got


def test_complete_validation(fixture):
    idx, _ = fixture
    with pytest.raises(ValueError):
        complete(idx, "s", by="nope")
    with pytest.raises(ValueError):
        complete(idx, "")
    assert complete(idx, "zzzz").count() == 0


class TestMget:
    def test_point_fetch_and_pushdown(self, fixture):
        idx, corpus = fixture
        ids = [r["doc_id"] for r in corpus.limit(4).collect()]
        got = idx.mget(ids + [999_999_999_999]).collect()
        assert sorted(r["doc_id"] for r in got) == sorted(ids)
        # stored fields ride along; dl is the field-0 token length
        texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
        for r in got:
            assert r["dl"] == len(texts[r["doc_id"]].split())
        # the id list reaches the parquet scan
        plan = idx.mget(ids)._jdf.queryExecution().executedPlan().toString()
        assert "In(doc_id" in plan

    def test_tombstones_excluded(self, spark, tmp_path_factory, fixture):
        _, corpus = fixture
        d = str(tmp_path_factory.mktemp("mget") / "idx")
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
            spark, corpus, id_col="doc_id", build_id="mg")
        ids = [r["doc_id"] for r in corpus.limit(3).collect()]
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)) \
            .delete_docs(spark, ids[:1])
        idx2 = SearchIndex(spark, d)
        assert sorted(r["doc_id"] for r in idx2.mget(ids).collect()) \
            == sorted(ids[1:])
        assert sorted(r["doc_id"] for r in
                      idx2.mget(ids, with_deleted=True).collect()) \
            == sorted(ids)

    def test_validation(self, fixture):
        idx, _ = fixture
        with pytest.raises(ValueError):
            idx.mget([])
