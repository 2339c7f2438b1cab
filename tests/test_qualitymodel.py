"""Linear quality classifier: hash-bucket math, fold order, SQL twin."""

import contextlib
import hashlib
import io

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from fatespark.qualitymodel import (pseudo_weights, quality_logit_df,
                                    quality_logit_sql, sigmoid_col)

DOCS = [
    (1, "Spark Runs FAST"),
    (2, "slow   slow\tslow"),
    (3, ""),                      # empty: logit == bias exactly
    (4, None),                    # null text: same as empty
    (5, "one token"),
]


def _py_logit(text, w, bias):
    toks = [t.lower() for t in (text or "").split()]
    if not toks:
        return bias
    s = 0.0
    for t in toks:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        s += w[h % len(w)]
    return bias + s / len(toks)


def test_weights_deterministic_and_bounded():
    w1, w2 = pseudo_weights(256, seed=77), pseudo_weights(256, seed=77)
    assert np.array_equal(w1, w2)
    assert (np.abs(w1) <= 1.0).all()
    assert np.abs(w1.mean()) < 0.2           # roughly centered
    assert not np.array_equal(w1, pseudo_weights(256, seed=78))


def test_logit_matches_python_reference(spark):
    w = pseudo_weights(64, seed=5)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["logit"]
           for r in quality_logit_df(df, w, bias=0.25).collect()}
    for i, text in DOCS:
        assert got[i] == round(_py_logit(text, list(w), 0.25), 6), i


def test_empty_doc_scores_bias(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["logit"], r["n_toks"])
           for r in quality_logit_df(df, pseudo_weights(64),
                                     bias=0.125).collect()}
    assert got[3] == (0.125, 0)
    assert got[4] == (0.125, 0)


def test_sql_twin_bit_exact(spark):
    w = pseudo_weights(128, seed=9)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = quality_logit_df(df, w, bias=0.05).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = con.execute(quality_logit_sql(w, bias=0.05)).df()
    assert len(got) == len(want)
    for c in ["doc_id", "n_toks", "logit", "keep"]:
        assert (got[c].values == want[c].values).all(), c


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        quality_logit_df(df, pseudo_weights(64)).explain()
    assert "Exchange" not in buf.getvalue()


def test_sigmoid_monotone(spark):
    df = spark.createDataFrame([(1, 0.0), (2, 2.0), (3, -2.0)],
                               "doc_id long, logit double")
    got = {r["doc_id"]: r["p"]
           for r in df.select("doc_id",
                              sigmoid_col(F.col("logit")).alias("p"))
           .collect()}
    assert got[1] == 0.5 and got[3] < 0.5 < got[2]
