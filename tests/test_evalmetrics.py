"""Ranking-quality eval (``fatespark/evalmetrics.py``): gain-literal
contracts and MRR@k / NDCG@k on a hand-checkable corpus."""

import math

import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.evalmetrics import dcg_gain, idcg, ranking_eval, rr_gain, \
    sql_gains
from fatespark.query import SearchIndex

DOCS = [
    (1, "apple banana cherry"),
    (2, "apple apple banana"),
    (3, "banana cherry cherry date"),
    (4, "apple banana banana banana"),
    (5, "cherry date elder"),
    (6, "apple cherry"),
    (7, "banana banana apple cherry"),
    (8, "apple date"),
    (9, "elder fig grape"),
    (10, "apple banana cherry date"),
]


class TestGains:
    def test_literal_values(self):
        assert rr_gain(1) == 1.0 and rr_gain(4) == 0.25
        assert dcg_gain(1) == 1.0
        assert dcg_gain(3) == 1.0 / math.log2(4.0)
        # idcg is the exact left-to-right partial sum of dcg gains
        assert idcg(1, 10) == 1.0
        assert idcg(3, 10) == (1.0 + dcg_gain(2)) + dcg_gain(3)
        assert idcg(99, 10) == idcg(10, 10)  # capped at k

    def test_sql_gains_match(self):
        rr, dc, ic = sql_gains(10)
        assert rr == [rr_gain(i) for i in range(1, 11)]
        assert dc == [dcg_gain(i) for i in range(1, 11)]
        assert ic == [idcg(n, 10) for n in range(1, 11)]


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    d = str(tmp_root / "evalm_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="evalm")
    return SearchIndex(spark, d), df


class TestRankingEval:
    def test_hand_checked_metrics(self, built):
        idx, docs = built
        out = {r["qid"]: r for r in
               ranking_eval(idx, docs, {"qa": ["apple", "banana"]},
                            k=10).collect()}
        row = out["qa"]
        # conjunctive qrel: docs containing BOTH apple and banana
        rel = {1, 2, 4, 7, 10}
        assert row["n_rel"] == len(rel)
        ranked = [r["doc_id"] for r in
                  idx.search(["apple", "banana"], k=10, mode="OR",
                             quantize=4).collect()]
        first = next(i for i, d in enumerate(ranked, 1) if d in rel)
        assert row["mrr"] == rr_gain(first)
        dcg = 0.0
        for i, d in enumerate(ranked, 1):
            if d in rel:
                dcg += dcg_gain(i)
        assert row["ndcg"] == dcg / idcg(len(rel), 10)

    def test_perfect_ranking_is_one(self, built):
        """A query whose relevant set fills the top ranks exactly scores
        NDCG 1 and MRR 1 (every AND-set doc must outrank non-rel docs
        only if BM25 puts it there — use a term unique to one doc)."""
        idx, docs = built
        out = ranking_eval(idx, docs, {"q": ["grape"]}, k=10).collect()[0]
        assert out["n_rel"] == 1
        assert out["mrr"] == 1.0 and out["ndcg"] == 1.0

    def test_no_relevant_docs(self, built):
        idx, docs = built
        out = ranking_eval(idx, docs, {"q": ["apple", "grape"]},
                           k=10).collect()[0]
        # no doc contains both -> n_rel 0, metrics 0
        assert out["n_rel"] == 0
        assert out["mrr"] == 0.0 and out["ndcg"] == 0.0

    def test_multi_query_ordered_by_qid(self, built):
        idx, docs = built
        rows = ranking_eval(idx, docs, {"b": ["banana"], "a": ["apple"]},
                            k=5).collect()
        assert [r["qid"] for r in rows] == ["a", "b"]

    def test_k_bounds(self, built):
        idx, docs = built
        with pytest.raises(ValueError):
            ranking_eval(idx, docs, {"q": ["apple"]}, k=0)
