"""Round-3 additions: CCNet-style quality tiers and streaming exact dedup.

Quality tiers (textops.quality_tiers_df): equal-mass head/middle/tail by
corpus-LM surprisal, boundaries from an exact CDF over the quantized-value
histogram — python-twin parity, the tie contract (one value -> one tier),
and partition invariance.

Streaming exact dedup (streaming.streaming_exact_dedup): final
applyInPandasWithState state per fingerprint == batch
exact_duplicate_groups over the unioned micro-batches, bit-exactly, for
any batch split.
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fatespark import dedup, textops
from fatespark.corpus import pages_pandas


def _pages(spark, n, parts=4):
    pdf = pages_pandas(np.arange(n))
    return (spark.createDataFrame(
        pdf[["url", "text"]]).withColumn(
            "doc_id", F.xxhash64("url")).repartition(parts))


def _tiers_twin(rows, quantize=4):
    """Pure-python twin of the tier contract over (doc_id, surprisal)."""
    hist = {}
    for _, s in rows:
        hist[s] = hist.get(s, 0) + 1
    n = len(rows)
    cum = 0
    t1 = t2 = None
    for v in sorted(hist):
        cum += hist[v]
        if t1 is None and cum * 3 >= n:
            t1 = v
        if t2 is None and cum * 3 >= 2 * n:
            t2 = v
    out = {}
    for d, s in rows:
        out[d] = "head" if s <= t1 else ("middle" if s <= t2 else "tail")
    return out


class TestQualityTiers:
    def test_matches_python_twin_and_masses(self, spark):
        docs = _pages(spark, 240)
        got = textops.quality_tiers_df(docs).collect()
        su = {r["doc_id"]: r["surprisal"] for r in got}
        twin = _tiers_twin(list(su.items()))
        assert {r["doc_id"]: r["tier"] for r in got} == twin
        # equal-mass up to tie granularity: head >= ceil(n/3) docs (the
        # boundary value is pulled DOWN into head), tail never exceeds
        # the remaining two-thirds complement
        n = len(got)
        n_head = sum(1 for r in got if r["tier"] == "head")
        n_tail = sum(1 for r in got if r["tier"] == "tail")
        assert n_head >= math.ceil(n / 3)
        assert n_head + n_tail <= n  # middle can be empty only via ties

    def test_tie_contract_one_value_one_tier(self, spark):
        # 9 docs, 3 distinct texts x3 copies: every copy of a text must
        # land in the same tier, and all three tiers are populated
        pdf = pd.DataFrame({
            "doc_id": list(range(9)),
            "text": (["common common common"] * 3
                     + ["common rare1 mixed"] * 3
                     + ["rare2 rare3 rare4"] * 3)})
        df = spark.createDataFrame(pdf).repartition(3)
        got = textops.quality_tiers_df(df).collect()
        by_s = {}
        for r in got:
            by_s.setdefault(r["surprisal"], set()).add(r["tier"])
        assert all(len(ts) == 1 for ts in by_s.values())
        assert {r["tier"] for r in got} == {"head", "middle", "tail"}

    def test_partition_invariance(self, spark):
        docs = _pages(spark, 120, parts=2)
        a = sorted((r["doc_id"], r["tier"])
                   for r in textops.quality_tiers_df(docs).collect())
        b = sorted((r["doc_id"], r["tier"]) for r in
                   textops.quality_tiers_df(docs.repartition(7)).collect())
        assert a == b


class TestStreamingExactDedup:
    @pytest.mark.parametrize("split_mod", [2, 3])
    def test_stream_equals_batch(self, spark, tmp_root, split_mod):
        from fatespark.streaming import streaming_exact_dedup

        docs = _pages(spark, 150).select("doc_id", "text")
        # plant exact duplicates across batches: copy 30 docs with new ids
        dups = (docs.limit(30)
                .select((F.col("doc_id") + F.lit(10 ** 15)).alias("doc_id"),
                        "text"))
        full = docs.unionByName(dups)

        src = str(tmp_root / f"dd_src_{split_mod}")
        for i in range(split_mod):
            (full.filter(F.pmod("doc_id", F.lit(split_mod)) == i)
             .coalesce(1).write.mode("append").parquet(src))

        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", "1").parquet(src))
        name = f"dd_stream_t{split_mod}"
        q = (streaming_exact_dedup(stream).writeStream
             .format("memory").queryName(name).outputMode("update")
             .option("checkpointLocation",
                     str(tmp_root / f"dd_ckpt_{split_mod}"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

        got = sorted(
            (r["fingerprint"], r["n_docs"], r["keep_id"]) for r in
            (spark.table(name).groupBy("fingerprint")
             .agg(F.max("n_docs").alias("n_docs"),
                  F.min("keep_id").alias("keep_id"))).collect())
        want = sorted(
            (r["fingerprint"], r["n_docs"], r["keep_id"])
            for r in dedup.exact_duplicate_groups(full).collect())
        assert got == want
        # the planted duplicates actually collapsed (the keep-id == group
        # min invariant is already covered by got == want above)
        n2 = [g for g in got if g[1] >= 2]
        assert len(n2) >= 30


class TestBigramSurprisal:
    def test_hand_example_and_partition_invariance(self, spark):
        # corpus: "a b" x3 and "a c" x1 -> c(a b)=3, c(a c)=1, c1(a)=4
        # doc "a b": s = -ln(3/4); doc "a c": s = -ln(1/4)
        pdf = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": ["a b", "a b", "a b", "a c"]})
        df = spark.createDataFrame(pdf)
        got = {r["doc_id"]: (r["nbg"], r["surprisal2"]) for r in
               textops.bigram_surprisal_df(df).collect()}
        assert got[1] == got[2] == got[3]
        assert got[1][0] == 1 and got[4][0] == 1
        assert got[1][1] == math.floor(-math.log(3 / 4) * 1e4) / 1e4
        assert got[4][1] == math.floor(-math.log(1 / 4) * 1e4) / 1e4

    def test_single_token_docs_excluded_and_invariance(self, spark):
        pdf = pages_pandas(np.arange(120))
        df = (spark.createDataFrame(pdf[["url", "text"]])
              .withColumn("doc_id", F.xxhash64("url")))
        a = sorted(map(tuple,
                       textops.bigram_surprisal_df(df.repartition(3))
                       .collect()))
        b = sorted(map(tuple,
                       textops.bigram_surprisal_df(df.repartition(11))
                       .collect()))
        assert a == b and len(a) > 0
        one = spark.createDataFrame(
            pd.DataFrame({"doc_id": [9], "text": ["solo"]}))
        assert textops.bigram_surprisal_df(one).count() == 0
