"""MaxSim late interaction: brute parity, integer exactness, plan."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fatespark.ann import splitmix64
from fatespark.maxsim import (Q, maxsim_topk, quantize_tokens,
                              split_multivector)

NTOK, DIM, N = 3, 8, 60


def _vecs():
    u = splitmix64(np.arange(N * NTOK * DIM, dtype=np.uint64)
                   + np.uint64(99))
    v = (u.astype(np.float64) / np.float64(2**64)) \
        .reshape(N, NTOK * DIM) * 2 - 1
    # doc 11: its 3rd token vector is (almost) the query's 1st token —
    # late interaction must find the aligned token wherever it sits
    v[11, 2 * DIM:3 * DIM] = v[0, 0:DIM] * 0.99
    return v.astype(np.float32)


@pytest.fixture(scope="module")
def emb(spark):
    v = _vecs()
    rows = [(i, [float(x) for x in v[i]]) for i in range(N)]
    return (spark.createDataFrame(rows,
                                  "vec_id long, embedding array<float>")
            .cache(), v)


def brute_maxsim(v, qtoks):
    qc = np.array(quantize_tokens(qtoks), dtype=np.int64)
    out = {}
    for i in range(len(v)):
        dts = np.array([[math.floor(float(x) * Q)
                         for x in v[i, t * DIM:(t + 1) * DIM]]
                        for t in range(NTOK)], dtype=np.int64)
        out[i] = int(sum((dts @ q).max() for q in qc))
    return out


def test_matches_brute_and_integer_exact(emb):
    df, v = emb
    qtoks = [list(map(float, v[0, t * DIM:(t + 1) * DIM]))
             for t in range(NTOK)]
    got = maxsim_topk(df.filter(F.col("vec_id") != 0), qtoks, k=59,
                      tokens_col=split_multivector("embedding",
                                                   NTOK, DIM)).collect()
    want = brute_maxsim(v, qtoks)
    order = sorted(range(1, N), key=lambda i: (-want[i], i))
    assert [r["vec_id"] for r in got] == order
    for r in got:
        assert r["score"] == want[r["vec_id"]]


def test_token_alignment_is_position_free(emb):
    """Doc 11 carries the query's FIRST token as its THIRD token — max
    over doc tokens finds it, so doc 11 outranks unrelated docs."""
    df, v = emb
    qtoks = [list(map(float, v[0, t * DIM:(t + 1) * DIM]))
             for t in range(NTOK)]
    got = [r["vec_id"] for r in maxsim_topk(
        df.filter(F.col("vec_id") != 0), qtoks, k=3,
        tokens_col=split_multivector("embedding", NTOK, DIM)).collect()]
    assert 11 in got


def test_plan_bounded_topk(emb):
    df, v = emb
    qtoks = [[0.1] * DIM] * NTOK
    plan = maxsim_topk(df, qtoks, k=5,
                       tokens_col=split_multivector("embedding", NTOK, DIM)
                       )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_validation(emb):
    df, v = emb
    with pytest.raises(ValueError):
        maxsim_topk(df, [], tokens_col=F.col("embedding"))
    with pytest.raises(ValueError):
        maxsim_topk(df, [[0.1] * DIM, [0.1] * (DIM - 1)],
                    tokens_col=F.col("embedding"))
