"""Tombstoned deletes + vacuum compaction — the delta-index capability the
reference declares unsupported (``README.markdown:95-96``)."""

import numpy as np
import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_df
from fatespark.local import LocalSearchIndex
from fatespark.query import SearchIndex
from fatespark.segments import decode_segment_row


@pytest.fixture()
def built(spark, tmp_path):
    d = str(tmp_path / "del_idx")
    b = IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1))
    corpus = pages_df(spark, 2500, partitions=4)
    b.build(spark, corpus, build_id="d")
    return b, d


def _top_ids(idx, terms, mode="OR", k=10):
    return [r["doc_id"] for r in idx.search(terms, k=k, mode=mode).collect()]


def test_deleted_docs_vanish_from_search(spark, built):
    b, d = built
    idx = SearchIndex(spark, d)
    victims = _top_ids(idx, ["the", "smith"], "AND", k=3)
    assert victims
    b.delete_docs(spark, victims)

    idx2 = SearchIndex(spark, d)  # re-open picks up tombstones
    after = _top_ids(idx2, ["the", "smith"], "AND", k=10)
    assert not set(victims) & set(after)
    # still returns a full page of live results
    assert len(after) == 10
    # WAND and exhaustive agree under tombstones
    w = [r["doc_id"] for r in idx2.search(["the", "smith", "jones"], k=10,
                                          mode="OR", use_wand=True).collect()]
    e = [r["doc_id"] for r in idx2.search(["the", "smith", "jones"], k=10,
                                          mode="OR").collect()]
    assert w == e
    assert not set(victims) & set(w)

    # local path honors tombstones too
    loc = LocalSearchIndex(d)
    la = loc.search(["the", "smith"], k=10, mode="AND")
    assert not set(victims) & set(la["doc_id"].tolist())
    assert la["doc_id"].tolist() == after


def test_vacuum_drops_postings_and_restats(spark, built):
    b, d = built
    idx = SearchIndex(spark, d)
    n0, avg0 = idx.n_docs, idx.avgdl
    victims = _top_ids(idx, ["the"], "OR", k=5)
    survivors_expected = _top_ids(SearchIndex(spark, d), ["smith", "jones"],
                                  "OR", k=20)
    b.delete_docs(spark, victims)
    pre = SearchIndex(spark, d)
    pre_results = _top_ids(pre, ["smith", "jones"], "OR", k=20)

    out = b.vacuum(spark)
    assert out["dropped"] == len(victims)

    post = SearchIndex(spark, d)
    assert post.tombstones is None
    assert post.n_docs == n0 - len(victims)
    assert post.avgdl != avg0
    # no posting of any victim survives anywhere
    rows = post.postings.collect()
    for r in rows:
        assert not set(int(x) for x in
                       decode_segment_row(r)["docs"].tolist()) & set(victims)
    # result SET matches the pre-vacuum tombstone-filtered query (scores
    # shift because n_docs/avgdl/df are now exact)
    post_results = _top_ids(post, ["smith", "jones"], "OR", k=20)
    assert set(post_results) <= set(survivors_expected) | set(pre_results)
    assert not set(victims) & set(post_results)
    # blocks got consolidated into one chunkless dir and stay doc-sorted
    assert post.postings.count() == out["blocks"]


def test_vacuum_without_tombstones_consolidates(spark, tmp_path):
    d = str(tmp_path / "cons_idx")
    b = IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=1))
    corpus = pages_df(spark, 1200, partitions=3)
    # two chunks -> interleaved doc ranges per (bucket, term)
    b.build(spark, corpus, build_id="c", n_chunks=2)
    idx0 = SearchIndex(spark, d)
    before = _top_ids(idx0, ["the", "smith"], "AND", k=10)
    nblocks0 = idx0.postings.count()
    out = b.vacuum(spark)
    idx1 = SearchIndex(spark, d)
    assert _top_ids(idx1, ["the", "smith"], "AND", k=10) == before
    assert idx1.n_docs == idx0.n_docs
    assert idx1.avgdl == idx0.avgdl
    # consolidation merged cross-chunk runs: no more blocks than before
    assert out["blocks"] <= nblocks0
