"""CommonTermsQuery: df split vs brute, required-match semantics, the
bit-identity-with-plain-OR law for qualifying docs, degenerate splits
(all rare == AND doc set, all common == plain OR), and validation."""

import pytest
from pyspark.sql import functions as F

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.commonterms import common_terms_search, split_by_df
from fatespark.corpus import pages_df
from fatespark.query import SearchIndex


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ct") / "idx")
    corpus = pages_df(spark, 1200, partitions=4).select(
        F.xxhash64("url").alias("doc_id"), "url", "text").localCheckpoint()
    IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1)).build(
        spark, corpus, id_col="doc_id", build_id="ct")
    return SearchIndex(spark, d), corpus


def _df_of(idx, term):
    st = idx.term_stats([term])
    return sum(v["df"] for v in st.get(term, {}).values())


def test_split_matches_brute(fixture):
    idx, _ = fixture
    q = ["the", "smith", "data", "zzznope"]
    rare, common = split_by_df(idx, q, max_doc_freq=0.5)
    cut = 0.5 * idx.n_docs
    for t in q:
        assert (t in rare) == (_df_of(idx, t) <= cut), t
    assert "zzznope" in rare          # absent terms are rare (df 0)
    assert set(rare) | set(common) == set(q)


def test_required_semantics_and_or_bit_identity(fixture):
    """Every returned doc contains every rare term, and its score equals
    the plain-OR score bit-for-bit."""
    idx, corpus = fixture
    q = ["the", "smith"]
    rare, common = split_by_df(idx, q, max_doc_freq=0.5)
    assert rare and common            # non-vacuous split
    res = {r["doc_id"]: r["score"] for r in
           common_terms_search(idx, q, k=50, max_doc_freq=0.5).collect()}
    assert res
    texts = {r["doc_id"]: (r["text"] or "").lower().split()
             for r in corpus.collect()}
    for d in res:
        for t in rare:
            assert t in texts[d], (d, t)
    plain = {r["doc_id"]: r["score"] for r in
             idx.search(q, k=10_000, mode="OR").collect()}
    for d, s in res.items():
        assert plain[d] == s          # bit-equal


def test_all_rare_equals_and_docset(fixture):
    idx, _ = fixture
    q = ["smith", "jones"]
    rare, common = split_by_df(idx, q, max_doc_freq=0.5)
    if common:
        pytest.skip("fixture vocabulary shifted")
    ct = [(r["doc_id"], r["score"]) for r in
          common_terms_search(idx, q, k=10, max_doc_freq=0.5).collect()]
    anded = [(r["doc_id"], r["score"]) for r in
             idx.search(q, k=10, mode="AND").collect()]
    assert ct == anded


def test_all_common_equals_plain_or(fixture):
    idx, _ = fixture
    q = ["the", "smith"]
    rare, common = split_by_df(idx, q, max_doc_freq=0.0001)
    assert not rare
    ct = [(r["doc_id"], r["score"]) for r in
          common_terms_search(idx, q, k=10,
                              max_doc_freq=0.0001).collect()]
    plain = [(r["doc_id"], r["score"]) for r in
             idx.search(q, k=10, mode="OR").collect()]
    assert ct == plain


def test_validation_and_absent_must(fixture):
    idx, _ = fixture
    with pytest.raises(ValueError):
        split_by_df(idx, ["the"], max_doc_freq=0.0)
    with pytest.raises(ValueError):
        idx.search(["the"], mode="AND", must_terms=["the"])
    with pytest.raises(ValueError):
        idx.search(["the"], mode="OR", use_wand=True, must_terms=["the"])
    with pytest.raises(ValueError):
        idx.search(["the"], mode="OR", must_terms=["data"])
    # a required term absent from the dictionary matches nothing
    assert common_terms_search(idx, ["the", "zzznope"], k=10,
                               max_doc_freq=0.5).count() == 0
