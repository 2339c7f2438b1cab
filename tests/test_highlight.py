"""Best-passage selection: python twin, DuckDB twin, tiebreak + fold
semantics."""

import duckdb
import pytest

from fatespark.highlight import (best_passages, best_passages_python,
                                 best_passages_sql)

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta "
        "iota kappa batch join batch lambda mu nu "
        "batch batch batch join join scan scan scan"),
    (2, "BATCH Join scan mixed CASE tokens here padding "
        "word word word word word word word word"),
    (3, "no query words at all in this document text"),
    (4, "batch " * 40),                  # many identical windows: tie
    (5, ""),                             # empty: excluded
    (6, None),                           # null: excluded
    (7, "scan"),                         # single-token doc, one window
    (8, "x y z batch join scan batch join scan w v u "
        "t s r q batch p o n m l k j"),
]


def test_python_twin_vs_spark(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["chunk_idx"], r["n_terms"], r["score"],
                         r["passage"])
           for r in best_passages(df, ["batch", "join", "scan"],
                                  passage_size=8).collect()}
    want = best_passages_python(DOCS, ["batch", "join", "scan"],
                                passage_size=8)
    assert got == want
    assert 3 not in got and 5 not in got and 6 not in got
    assert got[7][0] == 0 and got[7][1] == 1


def test_duckdb_twin_vs_spark(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = str(tmp_path / "docs.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{p}')")
    sql = best_passages_sql("documents", ["batch", "join", "scan"],
                            passage_size=8)
    duck = {int(r[0]): (int(r[1]), int(r[2]), float(r[3]), r[4])
            for r in con.sql(sql).fetchall()}
    got = {r["doc_id"]: (r["chunk_idx"], r["n_terms"], float(r["score"]),
                         r["passage"])
           for r in best_passages(df, ["batch", "join", "scan"],
                                  passage_size=8).collect()}
    assert got == duck


def test_tiebreak_earliest_window(spark):
    # every window of doc 4 is identical -> equal scores -> chunk 0 wins
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            best_passages(df, ["batch"], passage_size=8).collect()}
    assert rows[4]["chunk_idx"] == 0


def test_case_folding_counts_but_passage_is_raw(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            best_passages(df, ["batch", "join", "scan"],
                          passage_size=8).collect()}
    # doc 2's window 0 contains BATCH/Join/scan (all three fold-match)
    assert rows[2]["chunk_idx"] == 0 and rows[2]["n_terms"] == 3
    assert "BATCH" in rows[2]["passage"]        # raw case preserved


def test_requires_terms(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        best_passages(df, [])
