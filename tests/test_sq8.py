"""Scalar-quantized ANN: code parity, integer-exact candidate scores,
rerank law, persisted round-trip, plan shape."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fatespark.ann import splitmix64
from fatespark.sq8 import (Sq8VectorIndex, quantize_query, sq8_codes_col,
                           sq8_stats, sq8_topk)

DIM, N = 16, 150


def _vecs():
    u = splitmix64(np.arange(N * DIM, dtype=np.uint64) + np.uint64(42))
    v = (u.astype(np.float64) / np.float64(2**64)).reshape(N, DIM) * 2 - 1
    v[7] = v[0] * 0.97 + 0.01          # planted near-dup of the query
    return v.astype(np.float32)


@pytest.fixture(scope="module")
def emb(spark):
    v = _vecs()
    rows = [(i, [float(x) for x in v[i]]) for i in range(N)]
    return (spark.createDataFrame(rows, "vec_id long, embedding array<float>")
            .cache(), v)


def brute_codes(v, minv, maxv, bits=7):
    levels = (1 << bits) - 1
    sc = 0.0 if maxv == minv else levels / (maxv - minv)
    return np.array([[min(levels, max(0, math.floor((float(x) - minv) * sc)))
                      for x in row] for row in v], dtype=np.int64)


def test_stats_exact(emb):
    df, v = emb
    minv, maxv = sq8_stats(df)
    assert minv == float(v.min()) and maxv == float(v.max())


def test_codes_match_python_twin(emb):
    df, v = emb
    minv, maxv = sq8_stats(df)
    got = {r["vec_id"]: r["c"] for r in df.select(
        "vec_id", sq8_codes_col("embedding", minv, maxv).alias("c")
    ).collect()}
    want = brute_codes(v, minv, maxv)
    for i in range(N):
        assert got[i] == list(want[i]), i
    # query-side twin is the same function
    assert quantize_query([float(x) for x in v[3]], minv, maxv) \
        == list(want[3])


def test_candidate_scores_and_rerank_brute(emb):
    df, v = emb
    q = [float(x) for x in v[0]]
    base = df.filter(F.col("vec_id") != 0)
    minv, maxv = sq8_stats(base)
    codes = brute_codes(v, minv, maxv)
    qc = np.array(quantize_query(q, minv, maxv), dtype=np.int64)
    qs = codes @ qc
    got = sq8_topk(base, q, k=5, pool=20).collect()
    # pool = top-20 by (qscore DESC, vec_id ASC) among vec_id 1..N-1
    order = sorted(range(1, N), key=lambda i: (-qs[i], i))[:20]
    vd = v.astype(np.float64)
    cos = vd @ vd[0] / (np.linalg.norm(vd, axis=1) * np.linalg.norm(vd[0]))
    want = sorted(order, key=lambda i: (-cos[i], i))[:5]
    assert [r["vec_id"] for r in got] == want
    for r in got:
        assert r["qscore"] == int(qs[r["vec_id"]])
        assert r["cosine"] == pytest.approx(round(cos[r["vec_id"]], 4),
                                            abs=1e-9)
    assert got[0]["vec_id"] == 7      # the planted near-dup wins


def test_full_pool_equals_exact_cosine(emb):
    """With pool >= corpus the rerank IS the exact search — SQ can only
    lose candidates at the pool cut."""
    df, v = emb
    q = [float(x) for x in v[0]]
    base = df.filter(F.col("vec_id") != 0)
    from fatespark.ann import cosine_topk
    exact = [r["vec_id"] for r in cosine_topk(base, q, k=5).collect()]
    got = [r["vec_id"] for r in sq8_topk(base, q, k=5, pool=N).collect()]
    assert got == exact


def test_persisted_round_trip(emb, spark, tmp_root):
    df, v = emb
    q = [float(x) for x in v[0]]
    base = df.filter(F.col("vec_id") != 0)
    d = str(tmp_root / "sq8_idx")
    idx = Sq8VectorIndex.build(base, d, dim=DIM)
    a = sq8_topk(base, q, k=5, pool=20).collect()
    b = Sq8VectorIndex(d, dim=DIM).topk(spark, q, k=5, pool=20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_plan_is_bounded_topk(emb):
    df, v = emb
    q = [float(x) for x in v[0]]
    plan = sq8_topk(df, q, k=5, pool=20)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_validation(emb):
    df, v = emb
    with pytest.raises(ValueError):
        sq8_topk(df, [0.0] * DIM, k=10, pool=5)
    with pytest.raises(ValueError):
        sq8_stats(df.filter(F.col("vec_id") < 0))


def test_filtered_knn_prefilters(emb, spark):
    """Filtered knn: predicate FIRST, then rank — always k results from
    the filtered set (post-filtering a ranked list can return < k)."""
    df, v = emb
    q = [float(x) for x in v[0]]
    base = df.filter((F.col("vec_id") % 3 == 0) & (F.col("vec_id") != 0))
    got = sq8_topk(base, q, k=5, pool=20).collect()
    allowed = {r["vec_id"] for r in base.select("vec_id").collect()}
    assert len(got) == 5 and {r["vec_id"] for r in got} <= allowed
    # equals the brute filtered ranking (stats trained on the filter set)
    minv, maxv = sq8_stats(base)
    codes = brute_codes(v, minv, maxv)
    qc = np.array(quantize_query(q, minv, maxv), dtype=np.int64)
    ids = sorted(allowed)
    qs = {i: int(codes[i] @ qc) for i in ids}
    pool = sorted(ids, key=lambda i: (-qs[i], i))[:20]
    vd = v.astype(np.float64)
    cos = vd @ vd[0] / (np.linalg.norm(vd, axis=1) * np.linalg.norm(vd[0]))
    want = sorted(pool, key=lambda i: (-cos[i], i))[:5]
    assert [r["vec_id"] for r in got] == want


def test_batch_quantized_topk(emb, spark):
    """Batched ANN: each query's result equals its own brute quantized
    ranking; one scan serves all queries."""
    from fatespark.ann import batch_quantized_topk
    df, v = emb
    qids = [0, 1, 2]
    base = df.filter(~F.col("vec_id").isin(qids))
    qvs = [[float(x) for x in v[q]] for q in qids]
    got = batch_quantized_topk(base, qvs, k=5).collect()
    assert len(got) == 15
    codes = np.floor(v.astype(np.float64) * 4096.0).astype(np.int64)
    for qi, q in enumerate(qids):
        rows = [r for r in got if r["q_idx"] == qi]
        s = codes @ codes[q]
        order = sorted((i for i in range(N) if i not in qids),
                       key=lambda i: (-s[i], i))[:5]
        assert [r["vec_id"] for r in rows] == order
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        for r in rows:
            assert r["qscore"] == int(s[r["vec_id"]])
    with pytest.raises(ValueError):
        batch_quantized_topk(base, [], k=5)
