"""Sidecar staleness registry (fatespark.sidecars): stamps at write,
staleness after snapshot-advancing operations, strict gating."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fatespark import sidecars
from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_pandas
from fatespark.query import SearchIndex


@pytest.fixture()
def built(spark, tmp_path):
    d = str(tmp_path / "sc_idx")
    pdf = pages_pandas(np.arange(60))
    df = (spark.createDataFrame(pdf[["url", "text"]])
          .withColumn("doc_id", F.xxhash64("url"))
          .select("doc_id", "text"))
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="sc")
    return d, SearchIndex(spark, d), df


def test_stamped_writers_are_current(spark, built):
    from fatespark.phrasesuggest import write_bigram_lm
    from fatespark.suggest import write_fuzzy_variants
    d, idx, df = built
    write_fuzzy_variants(idx, depth=1)
    write_bigram_lm(idx, df, n_buckets=4)
    assert sidecars.check(d, "fuzzy_variants")
    assert sidecars.check(d, "bigram_lm")
    st = sidecars.staleness(d)
    assert set(st[st["stamped"]]["name"]) >= {"fuzzy_variants", "bigram_lm"}
    assert not st[st["stamped"]]["stale"].any()


def test_snapshot_advance_marks_stale_and_restamp_clears(spark, built):
    from fatespark.suggest import write_fuzzy_variants
    d, idx, df = built
    write_fuzzy_variants(idx, depth=1)
    assert sidecars.check(d, "fuzzy_variants")
    some = idx.docs.limit(1).collect()[0]["doc_id"]
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)) \
        .delete_docs(spark, [some])
    assert not sidecars.check(d, "fuzzy_variants")
    st = sidecars.staleness(d)
    row = st[st["name"] == "fuzzy_variants"].iloc[0]
    assert bool(row["stale"])
    with pytest.raises(ValueError, match="stale"):
        sidecars.check(d, "fuzzy_variants", strict=True)
    write_fuzzy_variants(SearchIndex(spark, d), depth=1)
    assert sidecars.check(d, "fuzzy_variants")


def test_unstamped_dir_reported_and_strict_raises(spark, built):
    d, idx, df = built
    import os
    os.makedirs(os.path.join(d, "postings_local"), exist_ok=True)
    st = sidecars.staleness(d)
    row = st[st["name"] == "postings_local"].iloc[0]
    assert not bool(row["stamped"])
    with pytest.raises(ValueError, match="unstamped"):
        sidecars.check(d, "postings_local", strict=True)


def test_compact_local_stamps(spark, built):
    d, idx, df = built
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)) \
        .compact_local(spark)
    assert sidecars.check(d, "postings_local")


class TestRefresh:
    def test_rebuilds_stale_preserving_params(self, spark, built):
        from fatespark.suggest import write_fuzzy_variants
        d, idx, df = built
        write_fuzzy_variants(idx, depth=1, n_buckets=8)
        some = idx.docs.limit(1).collect()[0]["doc_id"]
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)) \
            .delete_docs(spark, [some])
        idx2 = SearchIndex(spark, d)
        rep = sidecars.refresh(idx2)
        row = rep[rep["name"] == "fuzzy_variants"].iloc[0]
        assert row["action"] == "rebuilt"
        assert sidecars.check(d, "fuzzy_variants")
        # original build params preserved (depth=1, n_buckets=8)
        import glob as g
        import pyarrow.parquet as pq
        from fatespark.suggest import FUZZY_META_DIRNAME
        m = pq.read_table(sorted(g.glob(
            f"{d}/{FUZZY_META_DIRNAME}/*.parquet"))[0]).to_pandas().iloc[0]
        assert (int(m["depth"]), int(m["n_buckets"])) == (1, 8)

    def test_bigram_lm_needs_docs(self, spark, built):
        from fatespark.phrasesuggest import write_bigram_lm
        d, idx, df = built
        write_bigram_lm(idx, df, n_buckets=4)
        some = idx.docs.limit(1).collect()[0]["doc_id"]
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)) \
            .delete_docs(spark, [some])
        idx2 = SearchIndex(spark, d)
        rep = sidecars.refresh(idx2)   # no docs passed
        row = rep[rep["name"] == "bigram_lm"].iloc[0]
        assert row["action"] == "skipped-needs-docs"
        assert not sidecars.check(d, "bigram_lm")
        rep2 = sidecars.refresh(idx2, docs=df)
        assert rep2[rep2["name"] == "bigram_lm"].iloc[0]["action"] \
            == "rebuilt"
        assert sidecars.check(d, "bigram_lm")

    def test_dry_run_and_current(self, spark, built):
        from fatespark.suggest import write_fuzzy_variants
        d, idx, df = built
        write_fuzzy_variants(idx, depth=1)
        rep = sidecars.refresh(idx)
        assert rep[rep["name"] == "fuzzy_variants"].iloc[0]["action"] \
            == "current"
        some = idx.docs.limit(1).collect()[0]["doc_id"]
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)) \
            .delete_docs(spark, [some])
        rep2 = sidecars.refresh(SearchIndex(spark, d), dry_run=True)
        assert rep2[rep2["name"] == "fuzzy_variants"].iloc[0]["action"] \
            == "would-rebuild"
        assert not sidecars.check(d, "fuzzy_variants")
