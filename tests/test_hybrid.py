"""Hybrid RRF fusion: rank assignment, fused arithmetic, arm composition."""

import math

import pytest
from pyspark.sql import functions as F

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.hybrid import hybrid_rrf, ranked, rrf_fuse
from fatespark.query import SearchIndex

DOCS = [
    (1, "spark shuffle join broadcast"),
    (2, "spark shuffle partition skew"),
    (3, "join broadcast hash table"),
    (4, "cats dogs birds fish"),
    (5, "dogs cats hamster spark"),
    (6, "spark join broadcast shuffle"),
]

# tiny 4-d embeddings on the same ids: docs 1/2/6 cluster, 4/5 cluster
EMB = [
    (1, [1.0, 0.1, 0.0, 0.0]),
    (2, [0.9, 0.2, 0.1, 0.0]),
    (3, [0.5, 0.5, 0.2, 0.0]),
    (4, [0.0, 0.0, 1.0, 0.3]),
    (5, [0.0, 0.1, 0.9, 0.4]),
    (6, [1.0, 0.0, 0.1, 0.0]),
]


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    d = str(tmp_root / "hybrid_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="hy")
    return SearchIndex(spark, d)


def test_ranked_total_order(spark):
    df = spark.createDataFrame(
        [(10, 2.0), (11, 3.0), (12, 2.0)], "doc_id long, score double")
    out = ranked(df, [F.desc("score"), F.asc("doc_id")], "doc_id")
    got = {r["_id"]: r["rank"] for r in out.collect()}
    # tie at 2.0 broken by doc_id ASC
    assert got == {11: 1, 10: 2, 12: 3}


def test_rrf_fuse_arithmetic(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "_id long, rank int")
    rows = {r["doc_id"]: r for r in
            rrf_fuse([a, b], k=10, rrf_k=60).collect()}
    assert rows[2]["rrf_score"] == 1.0 / 62 + 1.0 / 61   # both arms
    assert rows[1]["rrf_score"] == 1.0 / 61              # text only
    assert rows[3]["rrf_score"] == 1.0 / 62              # vec only
    assert rows[1]["rank_1"] is None and rows[3]["rank_0"] is None
    # doc 2 wins: present in both
    top = rrf_fuse([a, b], k=1, rrf_k=60).collect()[0]
    assert top["doc_id"] == 2


def test_rrf_fuse_tie_breaks_by_id(spark):
    a = spark.createDataFrame([(5, 1), (3, 2)], "_id long, rank int")
    b = spark.createDataFrame([(3, 1), (5, 2)], "_id long, rank int")
    out = [r["doc_id"] for r in rrf_fuse([a, b], k=2).collect()]
    assert out == [3, 5]    # equal scores -> id ASC


def test_hybrid_rrf_end_to_end(spark, built):
    emb = spark.createDataFrame(EMB, "vec_id long, embedding array<double>")
    out = hybrid_rrf(built, emb, ["spark", "join"], [1.0, 0.1, 0.0, 0.0],
                     k=3, n_candidates=4).collect()
    assert [c for c in out[0].asDict()] == \
        ["doc_id", "rrf_score", "rank_text", "rank_vec"]
    # doc 1 is the query vector itself (cosine 1 -> vec rank 1) and a
    # strong text match; docs 1/6 must lead
    assert {out[0]["doc_id"], out[1]["doc_id"]} == {1, 6}
    for r in out:
        want = 0.0
        if r["rank_text"] is not None:
            want += 1.0 / (60 + r["rank_text"])
        if r["rank_vec"] is not None:
            want += 1.0 / (60 + r["rank_vec"])
        assert math.isclose(r["rrf_score"], want, rel_tol=0, abs_tol=0)


def test_hybrid_wand_arm_matches_exhaustive(spark, built):
    emb = spark.createDataFrame(EMB, "vec_id long, embedding array<double>")
    qv = [1.0, 0.1, 0.0, 0.0]
    a = hybrid_rrf(built, emb, ["spark", "join"], qv, k=5, n_candidates=4,
                   use_wand=False).collect()
    b = hybrid_rrf(built, emb, ["spark", "join"], qv, k=5, n_candidates=4,
                   use_wand=True).collect()
    assert [(r["doc_id"], r["rrf_score"]) for r in a] == \
        [(r["doc_id"], r["rrf_score"]) for r in b]


def test_linear_fuse_arithmetic(spark):
    from fatespark.hybrid import linear_fuse
    a = spark.createDataFrame([(1, 10.0), (2, 5.0), (3, 0.0)],
                              "_id long, s double")
    b = spark.createDataFrame([(2, 0.8), (4, 0.4)], "_id long, s double")
    rows = {r["doc_id"]: r for r in
            linear_fuse([a, b], [0.7, 0.3], k=10).collect()}
    # arm a normalizes 10->1, 5->0.5, 0->0; arm b: 0.8->1, 0.4->0
    assert rows[1]["fused_score"] == 0.7 * 1.0
    assert rows[2]["fused_score"] == 0.7 * 0.5 + 0.3 * 1.0
    assert rows[3]["fused_score"] == 0.0
    assert rows[4]["fused_score"] == 0.3 * 0.0
    assert rows[3]["norm_1"] is None and rows[4]["norm_0"] is None
    # doc 1 wins: 0.7*1.0 = 0.70 beats doc 2's 0.7*0.5 + 0.3*1.0 = 0.65
    assert linear_fuse([a, b], [0.7, 0.3], k=1).collect()[0]["doc_id"] == 1


def test_linear_fuse_degenerate_arm(spark):
    from fatespark.hybrid import linear_fuse
    a = spark.createDataFrame([(1, 3.0), (2, 3.0)], "_id long, s double")
    rows = {r["doc_id"]: r["fused_score"] for r in
            linear_fuse([a], [1.0], k=10).collect()}
    assert rows == {1: 1.0, 2: 1.0}   # max == min -> every candidate 1.0


def test_hybrid_linear_end_to_end(spark, built):
    from fatespark.hybrid import hybrid_linear
    emb = spark.createDataFrame(EMB, "vec_id long, embedding array<double>")
    out = hybrid_linear(built, emb, ["spark", "join"],
                        [1.0, 0.1, 0.0, 0.0], k=3, n_candidates=4).collect()
    assert [c for c in out[0].asDict()] == \
        ["doc_id", "fused_score", "norm_text", "norm_vec"]
    for r in out:
        want = 0.7 * (r["norm_text"] or 0.0) + 0.3 * (r["norm_vec"] or 0.0)
        assert math.isclose(r["fused_score"], want, rel_tol=0, abs_tol=0)
        for nm in ("norm_text", "norm_vec"):
            assert r[nm] is None or 0.0 <= r[nm] <= 1.0
    # the best text+vec doc leads with its arm maxima normalized to 1
    assert out[0]["fused_score"] <= 1.0


def test_linear_fuse_validation(spark):
    from fatespark.hybrid import linear_fuse
    a = spark.createDataFrame([(1, 1.0)], "_id long, s double")
    with pytest.raises(ValueError):
        linear_fuse([], [])
    with pytest.raises(ValueError):
        linear_fuse([a], [0.5, 0.5])
