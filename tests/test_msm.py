"""minimum_should_match: match-count floor on disjunctive search."""

import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.query import SearchIndex

DOCS = [
    (1, "alpha beta gamma delta"),      # matches 3
    (2, "alpha beta other words"),      # matches 2
    (3, "alpha only here now"),         # matches 1
    (4, "beta only here now"),          # matches 1
    (5, "gamma beta alpha alpha"),      # matches 3
    (6, "nothing relevant at all"),     # matches 0
]
Q = ["alpha", "beta", "gamma"]


@pytest.fixture(scope="module")
def idx(spark, tmp_root):
    d = str(tmp_root / "msm_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="msm")
    return SearchIndex(spark, d)


def _ids(df):
    return [r["doc_id"] for r in df.collect()]


def test_msm_filters_by_match_count(idx):
    assert set(_ids(idx.search(Q, k=10, mode="OR",
                               min_should_match=2))) == {1, 2, 5}
    assert set(_ids(idx.search(Q, k=10, mode="OR",
                               min_should_match=3))) == {1, 5}


def test_msm_1_is_plain_or(idx):
    a = idx.search(Q, k=10, mode="OR").collect()
    b = idx.search(Q, k=10, mode="OR", min_should_match=1).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
        [(r["doc_id"], r["score"]) for r in b]


def test_msm_scores_equal_plain_or(idx):
    """Qualifying docs keep the FULL disjunctive sum, bit-identical."""
    plain = {r["doc_id"]: r["score"]
             for r in idx.search(Q, k=10, mode="OR").collect()}
    for r in idx.search(Q, k=10, mode="OR", min_should_match=2).collect():
        assert r["score"] == plain[r["doc_id"]]


def test_msm_n_matches_and_candidates(idx):
    msm = idx.search(Q, k=10, mode="OR", min_should_match=3)
    anded = idx.search(Q, k=10, mode="AND")
    assert set(_ids(msm)) == set(_ids(anded))


def test_msm_missing_term_lowers_ceiling(idx):
    # one query term absent from the dictionary: floor of 3 on the 2
    # present terms can never be met -> empty
    out = idx.search(["alpha", "beta", "zzz_absent"], k=10, mode="OR",
                     min_should_match=3)
    assert out.count() == 0
    # floor of 2 still reachable
    got = set(_ids(idx.search(["alpha", "beta", "zzz_absent"], k=10,
                              mode="OR", min_should_match=2)))
    assert got == {1, 2, 5}


def test_msm_validation(idx):
    with pytest.raises(ValueError):
        idx.search(Q, k=10, mode="AND", min_should_match=2)
    with pytest.raises(ValueError):
        idx.search(Q, k=10, mode="OR", min_should_match=2, use_wand=True)
