"""Passage chunking with token overlap: brute-force window parity, the
coverage/overlap invariants, the zero-token contract, validation, the
DuckDB twin, and the zero-shuffle plan."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from fatespark.chunk import chunk_docs, chunk_docs_sql


def _brute(text, size, overlap):
    toks = [t for t in (text or "").split() if t]
    if not toks:
        return []
    stride = size - overlap
    out = []
    i = 0
    while True:
        win = toks[i * stride:i * stride + size]
        out.append((i, i * stride, len(win), " ".join(win)))
        if i * stride + size >= len(toks):
            break
        i += 1
    return out


ROWS = [
    (1, " ".join(f"t{i}" for i in range(300))),
    (2, " ".join(f"w{i}" for i in range(128))),
    (3, " ".join(f"w{i}" for i in range(129))),
    (4, "one two three"),
    (5, ""),
    (6, None),
    (7, "  a   b\t c \n"),
    (8, " ".join(f"x{i}" for i in range(96))),   # == stride exactly
    (9, "solo"),
]


@pytest.fixture(scope="module")
def chunked(spark):
    pdf = pd.DataFrame(ROWS, columns=["doc_id", "text"])
    df = chunk_docs(spark.createDataFrame(pdf), size=128, overlap=32)
    return df, df.orderBy("doc_id", "chunk_idx").toPandas()


def test_matches_bruteforce(chunked):
    _, got = chunked
    for doc_id, text in ROWS:
        expect = _brute(text, 128, 32)
        g = got[got.doc_id == doc_id]
        assert list(map(tuple, g[["chunk_idx", "chunk_start", "n_tokens",
                                  "chunk_text"]].values)) == expect, doc_id


def test_coverage_and_overlap_invariants(chunked):
    _, got = chunked
    g = got[got.doc_id == 1].sort_values("chunk_idx")
    texts = [t.split() for t in g.chunk_text]
    # consecutive chunks share exactly `overlap` tokens while full
    for a, b in zip(texts, texts[1:]):
        assert a[-32:] == b[:32]
    # concatenation minus overlaps reconstructs the token stream
    flat = texts[0] + [t for c in texts[1:] for t in c[32:]]
    assert flat == [f"t{i}" for i in range(300)]
    # no chunk starts at-or-past the end of the doc
    assert (g.chunk_start < 300).all() and g.n_tokens.iloc[-1] > 0


def test_zero_token_docs_yield_nothing(chunked):
    _, got = chunked
    assert set(got.doc_id) == {1, 2, 3, 4, 7, 8, 9}


def test_duckdb_twin_parity(chunked, spark):
    _, got = chunked
    pdf = pd.DataFrame(ROWS, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = con.sql(chunk_docs_sql("docs", 128, 32)
                  + " ORDER BY doc_id, chunk_idx").df()
    exp = exp.astype({c: got[c].dtype for c in got.columns})
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


def test_validation(spark):
    df = spark.createDataFrame(pd.DataFrame(ROWS[:1],
                                            columns=["doc_id", "text"]))
    with pytest.raises(ValueError):
        chunk_docs(df, size=0)
    with pytest.raises(ValueError):
        chunk_docs(df, size=10, overlap=10)
    with pytest.raises(ValueError):
        chunk_docs(df, size=10, overlap=-1)
    # overlap=0: disjoint windows, full coverage
    got = chunk_docs(df, size=100, overlap=0).orderBy("chunk_idx") \
        .toPandas()
    assert list(got.chunk_start) == [0, 100, 200]
    assert got.n_tokens.sum() == 300


def test_zero_shuffle_plan(chunked):
    df, _ = chunked
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" in plan
