"""Ordered span-near (Lucene SpanNearQuery ordered=true parity)."""

import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.query import SearchIndex

DOCS = [
    (1, "merge then a scan follows"),       # merge..scan slack 2
    (2, "scan before the merge here"),      # reversed order only
    (3, "merge scan adjacent"),             # slack 0
    (4, "merge one two three four scan"),   # slack 4
    (5, "alpha beta gamma"),                # neither
    (6, "scan merge scan"),                 # reversed AND forward (pos 0..2)
]


@pytest.fixture(scope="module")
def idx(spark, tmp_root):
    d = str(tmp_root / "onear_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="onear")
    return SearchIndex(spark, d)


def _ids(df):
    return {r["doc_id"] for r in df.collect()}


def test_order_matters(idx):
    fwd = _ids(idx.search_near(["merge", "scan"], slop=10, ordered=True))
    rev = _ids(idx.search_near(["scan", "merge"], slop=10, ordered=True))
    assert fwd == {1, 3, 4, 6}     # doc 2 is reversed-only
    assert 2 in rev


def test_slop_is_gap_slack(idx):
    assert _ids(idx.search_near(["merge", "scan"], slop=0,
                                ordered=True)) == {3, 6}   # consecutive
    assert _ids(idx.search_near(["merge", "scan"], slop=2,
                                ordered=True)) == {1, 3, 6}
    assert _ids(idx.search_near(["merge", "scan"], slop=4,
                                ordered=True)) == {1, 3, 4, 6}


def test_ordered_slop0_equals_phrase_docs(idx):
    ph = _ids(idx.search_phrase("merge scan", k=10))
    on = _ids(idx.search_near(["merge", "scan"], slop=0, ordered=True))
    assert on == ph


def test_unordered_superset(idx):
    uno = _ids(idx.search_near(["merge", "scan"], slop=3))
    ordo = _ids(idx.search_near(["merge", "scan"], slop=3, ordered=True))
    assert ordo <= uno
    assert 2 in uno and 2 not in ordo


def test_three_term_greedy_chain(spark, tmp_root):
    d = str(tmp_root / "onear3_idx")
    docs = [
        (1, "a x b y c"),          # slack (4-0)-2 = 2
        (2, "a b late late c"),    # slack (4-0)-2 = 2
        (3, "c b a"),              # wrong order
        (4, "a c b"),              # b after c only
        (5, "b a x b c"),          # greedy must use the SECOND b (pos 3)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="onear3")
    ix = SearchIndex(spark, d)
    got = _ids(ix.search_near(["a", "b", "c"], slop=2, ordered=True))
    assert got == {1, 2, 5}
    assert _ids(ix.search_near(["a", "b", "c"], slop=0,
                               ordered=True)) == set()


def test_repeated_terms_rejected(idx):
    with pytest.raises(ValueError):
        idx.search_near(["merge", "merge"], slop=2, ordered=True)


def test_scores_match_unordered_for_matching_docs(idx):
    """Ranking stays the conjunctive BM25 of the terms — identical scores
    to the unordered kernel for docs matching both."""
    # NB unordered slop is the window SPAN (max-min); ordered slop is the
    # GAP SLACK (span - (n-1)) — slop 5 unordered covers slack-4 ordered
    uno = {r["doc_id"]: r["score"]
           for r in idx.search_near(["merge", "scan"], slop=5).collect()}
    rows = idx.search_near(["merge", "scan"], slop=4,
                           ordered=True).collect()
    assert rows
    for r in rows:
        assert r["score"] == uno[r["doc_id"]]
