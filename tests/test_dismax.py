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


# extra docs that give 'delta' UNEQUAL per-field dfs (title df=1, body
# df=3) — the case cross_fields blending exists for
DOCS += [
    (6, "delta release", "notes about the delta delta format"),
    (7, "other title", "delta appears in this body"),
    (8, "another title", "and delta here too"),
]


class TestCrossFields:
    def test_matches_brute_force(self, idx):
        """tie=0 cross_fields == brute per-field BM25 parts under the
        BLENDED idf (max df across fields), max over fields, summed
        over ascending terms."""
        from fatespark.oracle import bm25_term_score, idf as idf_fn
        q = ["delta", "spark"]
        got = dict(_rows(idx.search(q, k=10, mode="OR",
                                    combine="cross_fields")))
        stats = idx.term_stats(sorted(q))
        favg = idx.field_avgdl
        # rebuild per-doc per-field tf/dl from the raw corpus
        per = {}
        dls = {}
        for d, title, body in DOCS:
            for f, txt in enumerate((title, body)):
                toks = txt.lower().split()
                dls[(d, f)] = len(toks)
                for t in toks:
                    per[(d, f, t)] = per.get((d, f, t), 0) + 1
        exp = {}
        for t in sorted(set(q)):
            bdf = max(st["df"] for st in stats[t].values())
            widf = idf_fn(idx.n_docs, bdf)
            for d in {dd for (dd, f, tt) in per if tt == t}:
                best = max(
                    bm25_term_score(per.get((d, f, t), 0), dls[(d, f)],
                                    favg[f], widf)
                    for f in (0, 1) if per.get((d, f, t), 0) > 0)
                exp[d] = exp.get(d, 0.0) + best
        assert set(got) == set(exp)
        for d in exp:
            assert got[d] == pytest.approx(exp[d], rel=0, abs=1e-12), d

    def test_blend_lowers_the_rare_field_idf(self, idx):
        """'delta' is rare in titles (df 1) but common in bodies (df 3):
        under cross_fields every stream uses idf(3), so the title-match
        doc scores strictly below its best_fields score, while body-only
        matches are bit-identical (their df IS the blended df)."""
        dm = dict(_rows(idx.search(["delta"], k=10, mode="OR",
                                   combine="dismax", tie_breaker=0.0)))
        cf = dict(_rows(idx.search(["delta"], k=10, mode="OR",
                                   combine="cross_fields")))
        assert set(dm) == set(cf)
        assert cf[6] < dm[6]              # title stream deflated
        assert cf[7] == dm[7] and cf[8] == dm[8]

    def test_equal_dfs_degenerate_to_dismax(self, idx):
        """'spark' has df 2 in BOTH fields: blending is a no-op, so
        cross_fields == dismax bit-for-bit at any tie."""
        for tie in (0.0, 0.4):
            a = _rows(idx.search(["spark"], k=10, mode="OR",
                                 combine="dismax", tie_breaker=tie))
            b = _rows(idx.search(["spark"], k=10, mode="OR",
                                 combine="cross_fields",
                                 tie_breaker=tie))
            assert a == b

    def test_validation(self, idx):
        with pytest.raises(ValueError):
            idx.search(["spark"], k=5, mode="AND",
                       combine="cross_fields")
        with pytest.raises(ValueError):
            idx.search(["spark"], k=5, mode="OR",
                       combine="cross_fields", similarity="classic")
