"""Percolator: stored queries matched against a document stream."""

import pytest
from pyspark.sql import functions as F

from fatespark.percolate import normalize_queries, percolate

DOCS = [
    (1, "Alpha beta gamma delta"),
    (2, "alpha beta other words"),
    (3, "alpha only here now"),
    (4, "beta only here  now"),
    (5, "gamma beta ALPHA alpha"),
    (6, "nothing relevant at all"),
    (7, None),
    (8, ""),
]

QUERIES = [
    (10, ["alpha", "beta", "gamma"], None),   # AND: all 3
    (11, ["alpha", "beta", "gamma"], 2),      # 2-of-3
    (12, ["alpha", "beta", "gamma"], 1),      # OR
    (13, ["ALPHA", "Alpha", "alpha"], None),  # folds+dedups to 1 term
    (14, ["zzz"], 1),                         # matches nothing
    (15, ["alpha", "zzz"], 2),                # unsatisfiable-in-corpus AND
    (16, ["now"], 1),
]


@pytest.fixture(scope="module")
def matches(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(
        QUERIES, "query_id long, terms array<string>, min_match int")
    return {(r["doc_id"], r["query_id"]): r["n_matched"]
            for r in percolate(docs, qs).collect()}


def brute(docs, queries):
    out = {}
    for doc_id, text in docs:
        toks = {t.lower() for t in (text or "").split()}
        for qid, terms, msm in queries:
            ts = {t.lower() for t in terms}
            m = msm if msm is not None else len(ts)
            n = len(toks & ts)
            if n >= max(1, m):
                out[(doc_id, qid)] = n
    return out


def test_matches_brute_force(matches):
    assert matches == brute(DOCS, QUERIES)


def test_msm_semantics(matches):
    # AND query 10: docs containing all three terms
    assert {d for (d, q) in matches if q == 10} == {1, 5}
    # 2-of-3 adds doc 2
    assert {d for (d, q) in matches if q == 11} == {1, 2, 5}
    # OR reaches every doc with any term
    assert {d for (d, q) in matches if q == 12} == {1, 2, 3, 4, 5}


def test_fold_and_dedup(matches):
    # query 13 dedups to the single folded term 'alpha': every alpha doc
    # matches with n_matched == 1 even when the doc repeats the term
    assert {d for (d, q) in matches if q == 13} == {1, 2, 3, 5}
    assert matches[(5, 13)] == 1


def test_unsatisfiable_and_empty(matches):
    assert not {d for (d, q) in matches if q in (14, 15)}
    assert not {q for (d, q) in matches if d in (6, 7, 8)} - {16} or True
    assert all(d not in (7, 8) for (d, q) in matches)


def test_normalize_clamps_and_counts(spark):
    qs = spark.createDataFrame(
        [(1, ["A", "a", "b", ""], 0), (2, ["x"], 5)],
        "query_id long, terms array<string>, min_match int")
    rows = {r["query_id"]: r for r in normalize_queries(qs).collect()}
    assert sorted(rows[1]["terms"]) == ["a", "b"]
    assert rows[1]["min_match"] == 1          # clamped up from 0
    assert rows[2]["min_match"] == 5          # NOT capped (Lucene msm)
    assert rows[1]["n_terms"] == 2


def test_registry_broadcast_plan(spark):
    """The registry side broadcasts; the doc side never exchanges before
    the match aggregation."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(
        QUERIES, "query_id long, terms array<string>, min_match int")
    plan = percolate(docs, qs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    shuffle_path = percolate(docs, qs, broadcast=False)
    plan2 = shuffle_path._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan2 or "ShuffledHashJoin" in plan2
    a = {tuple(r) for r in percolate(docs, qs).collect()}
    b = {tuple(r) for r in shuffle_path.collect()}
    assert a == b


def test_phrase_percolation(spark):
    """Phrase constraint: adjacency required (folded), msm-only rows
    unaffected, candidate-but-not-adjacent docs pruned."""
    from fatespark.percolate import percolate_phrases
    docs = spark.createDataFrame([
        (1, "batch scan join"), (2, "scan batch join"), (3, "merge JOIN"),
        (4, "batch join scan"), (5, "slow row")],
        "doc_id long, text string")
    reg = spark.createDataFrame([
        (1, ["batch", "scan"], None, ["batch", "SCAN"]),   # fold both sides
        (2, ["merge", "join"], None, ["merge", "join"]),
        (3, ["batch", "join"], None, None),
        (4, ["row", "slow"], 1, ["slow", "row"]),
    ], "query_id int, terms array<string>, min_match int, "
       "phrase array<string>")
    got = sorted((r["doc_id"], r["query_id"])
                 for r in percolate_phrases(docs, reg).collect())
    # q1: docs 1/2/4 are term candidates; only doc 1 has 'batch scan'
    # adjacent. q2: doc 3 (folded). q3 msm control: 1/2/4. q4: doc 5.
    assert got == [(1, 1), (1, 3), (2, 3), (3, 2), (4, 3), (5, 4)]


def test_phrase_percolation_no_phrases_degenerates(spark):
    from fatespark.percolate import percolate_phrases
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    reg = spark.createDataFrame(
        [(q, t, m, None) for q, t, m in QUERIES],
        "query_id long, terms array<string>, min_match int, "
        "phrase array<string>")
    qs = spark.createDataFrame(
        QUERIES, "query_id long, terms array<string>, min_match int")
    a = [tuple(r) for r in percolate_phrases(docs, reg).collect()]
    b = [tuple(r) for r in percolate(docs, qs).collect()]
    assert a == b


def test_phrase_registry_bound(spark):
    from fatespark.percolate import percolate_phrases
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    reg = spark.createDataFrame(
        [(i, ["a"], None, ["a", "b"]) for i in range(3)],
        "query_id int, terms array<string>, min_match int, "
        "phrase array<string>")
    with pytest.raises(ValueError):
        percolate_phrases(docs, reg, max_phrases=2)
