"""Product quantization: training, encoding, ADC scoring, rerank."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fatespark import ann

DIM, MSUB, K, ITERS = 16, 4, 4, 2
N = 120


def _vecs():
    u = ann.splitmix64(np.arange(N * DIM, dtype=np.uint64) + np.uint64(7))
    return (u.astype(np.float64) / np.float64(2**64)).reshape(N, DIM) * 2 - 1


def brute_train(vecs, seed="pq"):
    """Pure-numpy twin of pq_train: shared md5 seeding, per-subspace Lloyd
    on the exact grids."""
    import hashlib
    dsub = DIM // MSUB
    order = sorted(range(N), key=lambda i: (
        hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), i))
    qv = np.floor(vecs * 4096.0)
    full = qv[order[:K]]
    cent = np.stack([full[:, m * dsub:(m + 1) * dsub] for m in range(MSUB)])
    for _ in range(ITERS):
        nxt = cent.copy()
        for m in range(MSUB):
            sl = qv[:, m * dsub:(m + 1) * dsub]
            d2 = ((sl[:, None, :] - cent[m][None, :, :]) ** 2).sum(axis=2)
            cid = d2.argmin(axis=1)
            for c in range(K):
                mask = cid == c
                if mask.any():
                    s = sl[mask].sum(axis=0)
                    nxt[m, c] = np.floor(s * 1024.0 / mask.sum()) / 1024.0
        cent = nxt
    return cent


def brute_codes(vecs, cent):
    dsub = DIM // MSUB
    qv = np.floor(vecs * 4096.0)
    return np.stack([
        ((qv[:, None, m * dsub:(m + 1) * dsub]
          - cent[m][None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        for m in range(MSUB)], axis=1)


@pytest.fixture(scope="module")
def emb(spark):
    vecs = _vecs()
    return spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(N)],
        "vec_id long, embedding array<double>"), vecs


def test_train_matches_brute(emb):
    df, vecs = emb
    cb = ann.pq_train(df, DIM, MSUB, K, ITERS, seed="pq")
    ref = brute_train(vecs)
    assert cb.shape == (MSUB, K, DIM // MSUB)
    np.testing.assert_array_equal(cb, ref)


def test_encode_matches_brute(emb):
    df, vecs = emb
    cb = ann.pq_train(df, DIM, MSUB, K, ITERS, seed="pq")
    rows = {r["vec_id"]: r["codes"]
            for r in ann.pq_encode(df, cb).collect()}
    ref = brute_codes(vecs, cb)
    for i in range(N):
        assert rows[i] == ref[i].tolist()


def test_adc_topk_matches_brute(emb):
    df, vecs = emb
    cb = ann.pq_train(df, DIM, MSUB, K, ITERS, seed="pq")
    codes_df = ann.pq_encode(df, cb)
    q = vecs[0]
    got = [(r["vec_id"], r["adc"])
           for r in ann.pq_adc_topk(codes_df, q, cb, k=8).collect()]
    dt = ann.pq_adc_tables(q, cb)
    ref_codes = brute_codes(vecs, cb)
    adc = dt[np.arange(MSUB)[None, :], ref_codes].sum(axis=1)
    ref = sorted(zip(adc.tolist(), range(N)))[:8]
    assert got == [(i, a) for a, i in ref]


def test_adc_scan_no_exchange(emb):
    """The ADC scoring scan is narrow: literal lookup tables, no join, no
    shuffle — the plan is scan -> project -> TakeOrderedAndProject."""
    df, vecs = emb
    cb = ann.pq_train(df, DIM, MSUB, K, ITERS, seed="pq")
    plan = (ann.pq_adc_topk(ann.pq_encode(df, cb), vecs[1], cb, k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan


def test_persisted_index_and_rerank(spark, emb, tmp_root):
    df, vecs = emb
    d = str(tmp_root / "pq_idx")
    idx = ann.PqVectorIndex.build(df, d, dim=DIM, m_sub=MSUB,
                                  n_centroids=K, n_iters=ITERS, seed="pq")
    # a fresh handle reloads codebooks + codes from disk bit-identically
    idx2 = ann.PqVectorIndex(d, dim=DIM, m_sub=MSUB, n_centroids=K,
                             n_iters=ITERS, seed="pq")
    np.testing.assert_array_equal(idx.codebooks(), idx2.codebooks())
    a = [(r["vec_id"], r["adc"])
         for r in idx.topk(spark, vecs[3], k=7).collect()]
    b = [(r["vec_id"], r["adc"])
         for r in idx2.topk(spark, vecs[3], k=7).collect()]
    assert a == b
    # rerank: exact cosine over the ADC shortlist == brute cosine top-k
    # restricted to the shortlist ids
    short = {r["vec_id"]
             for r in idx2.topk(spark, vecs[3], k=50).collect()}
    rer = [(r["vec_id"], r["cosine"])
           for r in idx2.topk_rerank(spark, df, vecs[3], k=5,
                                     rerank=50).collect()]
    qn = vecs[3] / np.linalg.norm(vecs[3])
    assert all(i in short for i, _ in rer)
    order = sorted(rer, key=lambda t: (-t[1], t[0]))
    assert rer == order and len(rer) == 5


def test_dim_validation(emb):
    df, _ = emb
    with pytest.raises(ValueError):
        ann.pq_train(df, DIM, m_sub=5)
    idx = ann.PqVectorIndex("/tmp/nonexistent_pq", dim=DIM)
    with pytest.raises(ValueError):
        idx.topk(None, [0.0] * (DIM + 1))
