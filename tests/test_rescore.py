"""Rescoring-window operators: recency decay and per-group collapsing.

Both re-rank the exact BM25 top-``pool`` window (rescore.py); parity is
checked against a brute-force pandas re-implementation over the full
corpus with pool == corpus size (window exactness), plus window-semantics
checks at small pool.
"""

import math

import pandas as pd
import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.query import SearchIndex
from fatespark.rescore import collapsed_topk, recency_topk

NOW = 1_700_000_000
# doc_id, text, age_days, group
DOCS = [
    (1, "apple banana cherry", 0, "g1"),
    (2, "apple apple banana", 10, "g1"),
    (3, "banana cherry cherry date", 400, "g2"),
    (4, "apple banana banana banana", 30, "g2"),
    (5, "cherry date elder", 5, "g3"),
    (6, "apple cherry", 90, "g3"),
    (7, "banana banana apple cherry", 365, "g1"),
    (8, "apple date", 1, "g2"),
    (9, "elder fig grape", 50, "g3"),
    (10, "apple banana cherry date", 200, "g1"),
]


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    d = str(tmp_root / "rescore_idx")
    df = spark.createDataFrame([(i, t) for i, t, _, _ in DOCS],
                               "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="rescore")
    meta = spark.createDataFrame(
        [(i, NOW - age * 86400, grp) for i, _, age, grp in DOCS],
        "doc_id long, ts long, grp string")
    return SearchIndex(spark, d), meta


def _bm25_all(idx, terms, mode="OR"):
    rows = idx.search(terms, k=100, mode=mode).collect()
    return {r["doc_id"]: r["score"] for r in rows}


class TestRecency:
    def test_full_window_equals_brute_force(self, built):
        idx, meta = built
        terms, hl = ["apple", "banana"], 30.0
        scores = _bm25_all(idx, terms)
        ages = {i: age for i, _, age, _ in DOCS}
        want = sorted(
            ((i, s * math.pow(2.0, -(ages[i] / hl)))
             for i, s in scores.items()),
            key=lambda x: (-x[1], x[0]))[:5]
        got = recency_topk(idx, meta, terms, half_life_days=hl, now_ts=NOW,
                           ts_col="ts", k=5, pool=100).collect()
        assert [r["doc_id"] for r in got] == [i for i, _ in want]
        for r, (_, s) in zip(got, want):
            assert r["score"] == pytest.approx(s, rel=1e-12)

    def test_fresh_doc_outranks_stale_higher_bm25(self, built):
        idx, meta = built
        # doc 3 ('banana cherry cherry date', 400 days old) has high cherry
        # tf but decays to ~0; any fresh cherry doc must outrank it
        got = recency_topk(idx, meta, ["cherry"], half_life_days=30.0,
                           now_ts=NOW, ts_col="ts", k=3, pool=100).collect()
        assert got[0]["doc_id"] != 3
        assert 3 not in [r["doc_id"] for r in got]

    def test_window_semantics(self, built):
        idx, meta = built
        # pool=2: only the BM25 top-2 are eligible, whatever their age
        pool2 = recency_topk(idx, meta, ["apple"], half_life_days=30.0,
                             now_ts=NOW, ts_col="ts", k=2, pool=2).collect()
        top2_bm25 = sorted(_bm25_all(idx, ["apple"]).items(),
                           key=lambda x: (-x[1], x[0]))[:2]
        assert {r["doc_id"] for r in pool2} == {i for i, _ in top2_bm25}

    def test_timestamp_column(self, built, spark):
        idx, meta = built
        from pyspark.sql import functions as F
        tsm = meta.select("doc_id",
                          F.timestamp_seconds("ts").alias("warc_ts"))
        a = recency_topk(idx, tsm, ["apple"], half_life_days=30.0,
                         now_ts=NOW, k=5, pool=100).collect()
        b = recency_topk(idx, meta, ["apple"], half_life_days=30.0,
                         now_ts=NOW, ts_col="ts", k=5, pool=100).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == \
               [(r["doc_id"], r["score"]) for r in b]


class TestCollapse:
    def test_full_window_equals_brute_force(self, built):
        idx, meta = built
        terms, cap = ["apple", "banana", "cherry"], 1
        scores = _bm25_all(idx, terms)
        grp = {i: g for i, _, _, g in DOCS}
        pdf = pd.DataFrame(
            [(i, grp[i], s) for i, s in scores.items()],
            columns=["doc_id", "grp", "score"]).sort_values(
            ["score", "doc_id"], ascending=[False, True])
        pdf["rank"] = pdf.groupby("grp").cumcount() + 1
        want = pdf[pdf["rank"] <= cap].head(3)
        got = collapsed_topk(idx, meta, terms, group_col="grp",
                             per_group=cap, k=3, pool=100).collect()
        assert [r["doc_id"] for r in got] == list(want["doc_id"])
        assert [r["grp_rank"] for r in got] == list(want["rank"])
        # cap respected
        seen = [r["grp"] for r in got]
        assert len(seen) == len(set(seen))

    def test_cap_two(self, built):
        idx, meta = built
        got = collapsed_topk(idx, meta, ["apple", "banana", "cherry"],
                             group_col="grp", per_group=2, k=10,
                             pool=100).collect()
        counts: dict[str, int] = {}
        for r in got:
            counts[r["grp"]] = counts.get(r["grp"], 0) + 1
        assert all(v <= 2 for v in counts.values())
        # global order preserved
        ss = [r["score"] for r in got]
        assert ss == sorted(ss, reverse=True)

    def test_uncapped_matches_search(self, built):
        idx, meta = built
        terms = ["apple", "banana"]
        got = collapsed_topk(idx, meta, terms, group_col="grp",
                             per_group=100, k=5, pool=100).collect()
        base = idx.search(terms, k=5).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == \
               [(r["doc_id"], r["score"]) for r in base]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlans:
    """Scale-shape assertions: the rescoring join must broadcast the
    candidate window, never shuffle or nested-loop the corpus side."""

    def test_recency_broadcasts_candidates(self, built):
        idx, meta = built
        p = _plan(recency_topk(idx, meta, ["apple"], half_life_days=30.0,
                               now_ts=NOW, ts_col="ts", k=5, pool=50))
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_collapse_broadcasts_candidates(self, built):
        idx, meta = built
        p = _plan(collapsed_topk(idx, meta, ["apple"], group_col="grp",
                                 per_group=1, k=5, pool=50))
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


class TestStaticRank:
    """static_rank_topk: PageRank-prior fusion over the exact BM25
    window."""

    def test_matches_bruteforce_full_window(self, built, spark):
        from fatespark.rescore import static_rank_topk
        idx, _ = built
        # deterministic integer prior (fixed-point-PageRank-shaped)
        prior_rows = [(i, 1000 + 137 * ((i * 7) % 11)) for i in
                      range(1, 11)]
        prior = spark.createDataFrame(prior_rows, "node long, rank long")
        got = static_rank_topk(idx, prior, ["apple", "cherry"], k=5,
                               pool=100).collect()
        bm = _bm25_all(idx, ["apple", "cherry"])
        mx = float(max(r for _, r in prior_rows))
        want = sorted(((d, bm[d] * (r / mx)) for d, r in prior_rows
                       if d in bm),
                      key=lambda x: (-x[1], x[0]))[:5]
        assert [(r["doc_id"], r["score"]) for r in got] == want

    def test_prior_normalized_leq_one(self, built, spark):
        """Fused scores never exceed raw BM25 (factor <= 1 — the window
        exactness invariant)."""
        from fatespark.rescore import static_rank_topk
        idx, _ = built
        prior = spark.createDataFrame(
            [(i, i * 100) for i in range(1, 11)], "node long, rank long")
        bm = _bm25_all(idx, ["banana"])
        for r in static_rank_topk(idx, prior, ["banana"], k=10,
                                  pool=100).collect():
            assert r["score"] <= bm[r["doc_id"]] + 1e-12

    def test_missing_prior_drops_doc(self, built, spark):
        from fatespark.rescore import static_rank_topk
        idx, _ = built
        prior = spark.createDataFrame([(1, 10), (2, 5)],
                                      "node long, rank long")
        got = {r["doc_id"] for r in
               static_rank_topk(idx, prior, ["apple"], k=10,
                                pool=100).collect()}
        assert got <= {1, 2}

    def test_empty_prior_raises(self, built, spark):
        from fatespark.rescore import static_rank_topk
        idx, _ = built
        prior = spark.createDataFrame([], "node long, rank long")
        with pytest.raises(ValueError):
            static_rank_topk(idx, prior, ["apple"], k=5)


class TestDecay:
    def _meta_age(self, spark):
        return spark.createDataFrame(
            [(i, float(age)) for i, _, age, _ in DOCS],
            "doc_id long, age double")

    def test_gauss_matches_brute(self, built, spark):
        from fatespark.rescore import decay_topk
        idx, _ = built
        meta = self._meta_age(spark)
        got = decay_topk(idx, meta, ["apple", "banana"], shape="gauss",
                         origin=0.0, scale=100.0, offset=5.0, decay=0.5,
                         field_col="age", k=10, pool=10).collect()
        base = {r["doc_id"]: r["score"] for r in
                idx.search(["apple", "banana"], k=10, mode="OR").collect()}
        age = {i: a for i, _, a, _ in DOCS}
        want = {}
        for d, s in base.items():
            dist = max(abs(age[d] - 0.0) - 5.0, 0.0)
            want[d] = s * 0.5 ** ((dist / 100.0) ** 2)
        for r in got:
            assert r["score"] == pytest.approx(want[r["doc_id"]],
                                               rel=1e-12)
        order = sorted(want, key=lambda d: (-want[d], d))[:10]
        assert [r["doc_id"] for r in got] == order

    def test_offset_plateau_keeps_bm25(self, built, spark):
        from fatespark.rescore import decay_topk
        idx, _ = built
        meta = self._meta_age(spark)
        got = {r["doc_id"]: r["score"] for r in decay_topk(
            idx, meta, ["apple"], shape="gauss", origin=0.0, scale=50.0,
            offset=10.0, decay=0.5, field_col="age", k=10,
            pool=10).collect()}
        base = {r["doc_id"]: r["score"] for r in
                idx.search(["apple"], k=10, mode="OR").collect()}
        for d, a in ((1, 0), (2, 10), (8, 1)):   # inside the offset
            assert got[d] == base[d]

    def test_shapes_at_scale_equal_decay(self, built, spark):
        """At dist == scale every shape multiplies by exactly `decay`."""
        from fatespark.rescore import decay_topk
        idx, _ = built
        meta = spark.createDataFrame([(i, 100.0) for i, _, _, _ in DOCS],
                                     "doc_id long, age double")
        base = {r["doc_id"]: r["score"] for r in
                idx.search(["apple"], k=10, mode="OR").collect()}
        for shape in ("gauss", "exp", "linear"):
            got = {r["doc_id"]: r["score"] for r in decay_topk(
                idx, meta, ["apple"], shape=shape, origin=0.0,
                scale=100.0, decay=0.4, field_col="age", k=10,
                pool=10).collect()}
            for d, s in got.items():
                assert s == pytest.approx(base[d] * 0.4, rel=1e-12), shape

    def test_linear_floors_at_zero(self, built, spark):
        from fatespark.rescore import decay_topk
        idx, _ = built
        meta = spark.createDataFrame([(i, 1000.0) for i, _, _, _ in DOCS],
                                     "doc_id long, age double")
        got = decay_topk(idx, meta, ["apple"], shape="linear", origin=0.0,
                         scale=100.0, decay=0.5, field_col="age", k=10,
                         pool=10).collect()
        assert got and all(r["score"] == 0.0 for r in got)

    def test_validation(self, built, spark):
        from fatespark.rescore import decay_topk
        idx, _ = built
        meta = self._meta_age(spark)
        with pytest.raises(ValueError):
            decay_topk(idx, meta, ["apple"], shape="step", origin=0.0,
                       scale=1.0, field_col="age")
        with pytest.raises(ValueError):
            decay_topk(idx, meta, ["apple"], shape="exp", origin=0.0,
                       scale=0.0, field_col="age")


class TestFieldValueFactor:
    def _meta(self, spark):
        # planted numeric field: doc_id * 3 (no nulls except doc 9)
        rows = [(i, None if i == 9 else float(i * 3)) for i, *_ in DOCS]
        return spark.createDataFrame(rows, "doc_id long, votes double")

    @pytest.mark.parametrize("modifier,fn", [
        ("none", lambda v: v),
        ("log1p", lambda v: math.log10(1.0 + v)),   # ES log1p is base-10
        ("ln1p", lambda v: math.log1p(v)),          # ES ln1p is natural
        ("sqrt", lambda v: math.sqrt(v)),
        ("square", lambda v: v * v),
        ("reciprocal", lambda v: 1.0 / v),
    ])
    def test_full_window_equals_brute_force(self, built, spark,
                                            modifier, fn):
        from fatespark.rescore import field_value_factor_topk
        idx, _ = built
        meta = self._meta(spark)
        scores = _bm25_all(idx, ["apple", "banana"])
        vals = {i: (1.0 if i == 9 else i * 3) for i, *_ in DOCS}
        want = sorted(((i, s * fn(0.5 * vals[i]))
                       for i, s in scores.items()),
                      key=lambda x: (-x[1], x[0]))[:5]
        got = [(r["doc_id"], r["score"]) for r in field_value_factor_topk(
            idx, meta, ["apple", "banana"], field_col="votes",
            factor=0.5, modifier=modifier, k=5, pool=100).collect()]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (d, g), (_, w) in zip(got, want):
            assert g == pytest.approx(w, rel=0, abs=1e-12)

    def test_missing_value_default(self, built, spark):
        from fatespark.rescore import field_value_factor_topk
        idx, _ = built
        meta = self._meta(spark)
        scores = _bm25_all(idx, ["elder"])   # doc 9 matches 'elder'
        got = {r["doc_id"]: r["score"] for r in field_value_factor_topk(
            idx, meta, ["elder"], field_col="votes", missing=7.0,
            k=10, pool=100).collect()}
        assert got[9] == pytest.approx(scores[9] * 7.0, abs=1e-12)

    def test_boosting_reranks(self, built, spark):
        """A large stored field lifts a lower-BM25 doc above a higher
        one — the boost_mode:multiply semantics, unbounded above 1."""
        from fatespark.rescore import field_value_factor_topk
        idx, _ = built
        meta = self._meta(spark)
        base = sorted(_bm25_all(idx, ["apple"]).items(),
                      key=lambda x: (-x[1], x[0]))
        got = [r["doc_id"] for r in field_value_factor_topk(
            idx, meta, ["apple"], field_col="votes", k=10,
            pool=100).collect()]
        base_ids = [d for d, _ in base]
        assert set(got) == set(base_ids)
        assert got != base_ids   # votes actually re-rank

    def test_validation(self, built, spark):
        from fatespark.rescore import field_value_factor_topk
        idx, _ = built
        with pytest.raises(ValueError):
            field_value_factor_topk(idx, self._meta(spark), ["apple"],
                                    field_col="votes", modifier="exp2")
