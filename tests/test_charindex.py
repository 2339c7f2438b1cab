"""Char-granular substring lookup (fatespark.charindex) — the
suffix-array-parity surface: token-boundary-crossing patterns, case
folding, ad-hoc vs persisted-probe equivalence, physical pruning."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fatespark import charindex
from fatespark.corpus import pages_pandas


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pages_pandas(np.arange(80))
    return (spark.createDataFrame(pdf[["url", "text"]])
            .withColumn("doc_id", F.xxhash64("url"))
            .select("doc_id", "text").repartition(4))


def _brute(rows, pattern):
    from fatespark.analysis import ascii_fold
    p = ascii_fold(pattern)
    out = []
    for d, t in rows:
        ft = ascii_fold(t or "")
        start = 0
        while True:
            i = ft.find(p, start)
            if i < 0:
                break
            out.append((d, i + 1))
            start = i + 1
    return sorted(out)


class TestSubstrFind:
    def test_matches_brute_force_cross_boundary(self, spark, docs):
        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        for pat in ["e batch s", "a", "scan", "xx-never"]:
            got = sorted((r["doc_id"], r["pos"]) for r in
                         charindex.substr_find(docs, pat).collect())
            assert got == _brute(rows, pat), pat

    def test_case_folded_like_reference(self, spark):
        df = spark.createDataFrame(pd.DataFrame(
            {"doc_id": [1], "text": ["Alpha BETA gamma"]}))
        got = sorted((r["doc_id"], r["pos"]) for r in
                     charindex.substr_find(df, "A BETA G").collect())
        assert got == [(1, 5)]

    def test_empty_pattern_rejected(self, spark, docs):
        with pytest.raises(ValueError):
            charindex.substr_find(docs, "")


class TestCharIndexPersisted:
    def test_probe_equals_adhoc_and_prunes(self, spark, docs, tmp_root):
        d = str(tmp_root / "charidx")
        idx = charindex.CharIndex.build(docs, d, k=8, n_buckets=16)
        for pat in ["e batch s", "scan", "zz-none"]:
            a = sorted(map(tuple,
                           charindex.substr_find(docs, pat).collect()))
            b = sorted(map(tuple,
                           idx.find(spark, docs, pat).collect()))
            assert a == b, pat
        # physical pruning: the probe's plan reads ONE kbucket directory
        plan = idx.find(spark, docs, "e batch s") \
                  ._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "kbucket" in plan
