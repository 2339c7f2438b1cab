"""Multi-field (weighted-field) indexing + BM25F-style scoring, the Spark
upgrade of the reference's two-field weighted contacts search
(``tasks/fates.rake:39-49,95``: fields [last_name, first_name], weights
[20000000, 100000000])."""

import math

import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import contacts_df
from fatespark.oracle import bm25_term_score, idf
from fatespark.query import SearchIndex

N = 3000
WEIGHTS = [0.2, 1.0]  # field 0 = first_name, field 1 = last_name


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    d = str(tmp_root / "contacts_idx")
    contacts = contacts_df(spark, N, partitions=4)
    IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1)).build(
        spark, contacts, id_col="id", url_col="id",
        text_cols=["first_name", "last_name"], build_id="mf")
    idx = SearchIndex(spark, d)
    rows = contacts.collect()
    return idx, [(r["id"], r["first_name"], r["last_name"]) for r in rows]


def _oracle_scores(rows, terms, weights):
    """Weighted per-field BM25 over the contacts corpus: every field has
    dl=1, avgdl=1; contributions summed ascending (term, field)."""
    n = len(rows)
    fields = [{i: fn.lower() for i, fn, _ in rows},
              {i: ln.lower() for i, _, ln in rows}]
    scores = {}
    for t in sorted(set(terms)):
        for f, col in enumerate(fields):
            df = sum(1 for v in col.values() if v == t)
            if df == 0:
                continue
            # engine form: (weight * idf) scalar times the tf/length part —
            # mirror the parenthesization exactly for bit-equal float64
            from fatespark.wand import bm25_part
            wiv = weights[f] * idf(n, df)
            for i, v in col.items():
                if v == t:
                    s = wiv * float(bm25_part(1, 1, 1.0))
                    scores[i] = scores.get(i, 0.0) + s
    return scores


def test_meta_and_field_stats(built):
    idx, rows = built
    assert idx.n_fields == 2
    assert idx.field_avgdl == {0: 1.0, 1: 1.0}
    assert idx.n_docs == N


def test_count_per_field(built):
    idx, rows = built
    smith_last = sum(1 for _, _, ln in rows if ln == "Smith")
    smith_first = sum(1 for _, fn, _ in rows if fn == "Smith")
    assert idx.count("Smith", field=1) == smith_last
    assert idx.count("Smith", field=0) == smith_first
    assert idx.count("Smith") == smith_last + smith_first  # hit locations
    assert idx.count("james", field=0) > 0
    assert idx.count("james", field=1) == 0


@pytest.mark.parametrize("mode,terms", [
    ("OR", ["smith"]),
    ("OR", ["smith", "james"]),
    ("AND", ["james", "smith"]),
])
def test_weighted_topk_matches_oracle(built, mode, terms):
    idx, rows = built
    got = idx.search(terms, k=15, mode=mode, weights=WEIGHTS).collect()
    oracle = _oracle_scores(rows, terms, WEIGHTS)
    if mode == "AND":
        # doc must contain every term in at least one field
        def has(i):
            fn = rows[i - 1][1].lower()
            ln = rows[i - 1][2].lower()
            return all(t in (fn, ln) for t in terms)
        oracle = {i: s for i, s in oracle.items() if has(i)}
    want = sorted(oracle.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert [(r["doc_id"], r["score"]) for r in got] == \
        [(i, pytest.approx(s, abs=0, rel=0)) for i, s in want]


def test_weight_zero_drops_field(built):
    idx, rows = built
    got = idx.search(["smith"], k=2000, mode="OR",
                     weights=[0.0, 1.0]).collect()
    want = {i for i, fn, ln in rows if ln == "Smith"}
    assert {r["doc_id"] for r in got} == want


def test_wand_matches_exhaustive_multifield(built):
    idx, _ = built
    a = idx.search(["smith", "jones", "james"], k=10, mode="OR",
                   weights=WEIGHTS).collect()
    b = idx.search(["smith", "jones", "james"], k=10, mode="OR",
                   weights=WEIGHTS, use_wand=True).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
        [(r["doc_id"], r["score"]) for r in b]


def test_reference_smith_scenario(built):
    """The reference's README scenario: ranked QUERY='Smith' over contacts —
    every doc with last_name Smith outranks any first-name-only match under
    last-heavy weights (fates' [20000000, 100000000] ratio)."""
    idx, rows = built
    k = 30
    got = idx.search(["smith"], k=k, mode="OR", weights=[0.2, 1.0]).collect()
    smith_last = {i for i, fn, ln in rows if ln == "Smith"}
    top = [r["doc_id"] for r in got]
    assert len(top) == min(k, idx.count("smith"))
    n_last = min(len(smith_last), k)
    assert all(d in smith_last for d in top[:n_last])
