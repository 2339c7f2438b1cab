"""dis_max / best_fields: per-term disjunction-max over field streams."""

import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.query import SearchIndex

# two fields: title-like and body-like; "spark" in both fields of doc 1
DOCS = [
    (1, "spark engine", "spark runs the spark engine fast"),
    (2, "join planner", "the planner chooses a join order"),
    (3, "spark tips", "tips and tricks collection"),
    (4, "misc notes", "spark appears only in the body here"),
    (5, "unrelated doc", "completely different content"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_root):
    d = str(tmp_root / "dismax_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, title string, body string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id",
        text_cols=["title", "body"], build_id="dm")
    return SearchIndex(spark, d)


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_tie_one_equals_field_sum(idx):
    """tie_breaker=1.0 degenerates to the BM25F sum — bit-identical."""
    a = _rows(idx.search(["spark", "join"], k=10, mode="OR"))
    b = _rows(idx.search(["spark", "join"], k=10, mode="OR",
                         combine="dismax", tie_breaker=1.0))
    assert a == b


def test_tie_zero_is_pure_best_field(spark, idx):
    """With tie=0, a term in both fields scores only its best field, so
    the dismax score is <= the sum score, strictly less when both fields
    match (doc 1)."""
    sums = dict(_rows(idx.search(["spark"], k=10, mode="OR")))
    dms = dict(_rows(idx.search(["spark"], k=10, mode="OR",
                                combine="dismax", tie_breaker=0.0)))
    assert set(dms) == set(sums)
    assert dms[1] < sums[1]          # spark in title AND body
    assert dms[4] == sums[4]         # spark in body only: max == sum


def test_tie_interpolates(idx):
    lo = dict(_rows(idx.search(["spark"], k=10, mode="OR",
                               combine="dismax", tie_breaker=0.0)))
    mid = dict(_rows(idx.search(["spark"], k=10, mode="OR",
                                combine="dismax", tie_breaker=0.3)))
    hi = dict(_rows(idx.search(["spark"], k=10, mode="OR",
                               combine="dismax", tie_breaker=1.0)))
    assert lo[1] < mid[1] < hi[1]
    assert lo[4] == mid[4] == hi[4]  # single-field doc invariant to tie


def test_dismax_validation(idx):
    with pytest.raises(ValueError):
        idx.search(["spark"], k=5, mode="AND", combine="dismax")
    with pytest.raises(ValueError):
        idx.search(["spark"], k=5, mode="OR", combine="dismax",
                   use_wand=True)
    with pytest.raises(ValueError):
        idx.search(["spark"], k=5, mode="OR", combine="nope")
