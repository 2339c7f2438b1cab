"""DSIR importance weights (fatespark.dsir) and the Bloom seen-set
(fatespark.sketch.bloom_*): behavioral invariants. Bit-level parity with
the DuckDB twins is covered by the driver oracles (tx_dsir, dd_url_seen)
and tools/selfcheck.py.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fatespark import dsir
from fatespark.corpus import pages_pandas
from fatespark.sketch import bloom_build, bloom_positions, bloom_probe


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pages_pandas(np.arange(160))
    pdf["lang"] = ["en" if i % 3 else "ru" for i in range(160)]
    return (spark.createDataFrame(pdf[["url", "text", "lang"]])
            .withColumn("doc_id", F.xxhash64("url"))
            .repartition(4))


class TestDsir:
    def test_partition_invariance_and_shape(self, spark, docs):
        tgt = F.col("lang") == "en"
        a = {r["doc_id"]: (r["n_grams"], r["logw"]) for r in
             dsir.dsir_logweights(docs, tgt, m=256).collect()}
        b = {r["doc_id"]: (r["n_grams"], r["logw"]) for r in
             dsir.dsir_logweights(docs.repartition(9), tgt,
                                  m=256).collect()}
        assert a == b and len(a) == 160
        # n_grams = unigrams + bigrams = 2*ntok - 1
        ntoks = {r["doc_id"]: r["n"] for r in docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
            .collect()}
        assert all(v[0] == 2 * ntoks[d] - 1 for d, v in a.items())

    def test_identical_text_identical_weight(self, spark):
        pdf = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "lang": ["en", "ru", "en", "ru"],
            "text": ["alpha beta gamma"] * 2 + ["delta epsilon"] * 2})
        out = {r["doc_id"]: r["logw"] for r in dsir.dsir_logweights(
            spark.createDataFrame(pdf), F.col("lang") == "en",
            m=64).collect()}
        assert out[1] == out[2] and out[3] == out[4]

    def test_target_lookalikes_score_higher(self, spark):
        # target docs use vocab A, raw-only docs vocab B; a fresh doc
        # written in vocab A must outscore one written in vocab B
        rows = [(i, "en", "apple banana cherry date") for i in range(20)]
        rows += [(100 + i, "ru", "quark gluon boson lepton")
                 for i in range(20)]
        rows += [(999, "xx", "apple banana cherry date"),
                 (998, "xx", "quark gluon boson lepton")]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "lang", "text"]))
        out = {r["doc_id"]: r["logw"] for r in dsir.dsir_logweights(
            df, F.col("lang") == "en", m=512).collect()}
        assert out[999] > out[998]

    def test_empty_docs_excluded(self, spark):
        df = spark.createDataFrame(pd.DataFrame(
            {"doc_id": [1, 2], "lang": ["en", "en"],
             "text": ["hello world", "   "]}))
        got = dsir.dsir_logweights(df, F.col("lang") == "en").collect()
        assert [r["doc_id"] for r in got] == [1]


class TestBloom:
    M, K = 1 << 14, 4

    def _urls(self, n, pref="u"):
        return [f"https://{pref}{i}.test/p/{i}" for i in range(n)]

    def test_no_false_negatives_and_invariance(self, spark):
        vals = self._urls(800)
        df = spark.createDataFrame(pd.DataFrame({"url": vals}))
        bloom = bloom_build(df, "url", m_bits=self.M, k=self.K)
        words_a = sorted((r["word_idx"], r["word"])
                         for r in bloom.collect())
        words_b = sorted((r["word_idx"], r["word"]) for r in bloom_build(
            df.repartition(11), "url", m_bits=self.M, k=self.K).collect())
        assert words_a == words_b
        # 32-bit packing: every word is a non-negative int32-range value
        assert all(0 <= w < (1 << 32) for _, w in words_a)
        assert all(0 <= i < self.M // 32 for i, _ in words_a)
        got = bloom_probe(bloom, df, "url",
                          m_bits=self.M, k=self.K).collect()
        assert all(r["member"] for r in got)

    def test_absent_values_mostly_rejected(self, spark):
        ins = spark.createDataFrame(
            pd.DataFrame({"url": self._urls(500)}))
        probes = spark.createDataFrame(
            pd.DataFrame({"url": self._urls(500, pref="absent")}))
        bloom = bloom_build(ins, "url", m_bits=self.M, k=self.K)
        got = bloom_probe(bloom, probes, "url",
                          m_bits=self.M, k=self.K).collect()
        fp = sum(r["member"] for r in got)
        # theoretical fp rate at n=500, m=16384, k=4 is ~0.2%; allow 10x
        assert fp <= 10

    def test_positions_deterministic(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"url": ["x"]}))
        a = df.select(bloom_positions("url", self.M, self.K)).collect()
        b = df.select(bloom_positions("url", self.M, self.K)).collect()
        assert a == b and len(a[0][0]) == self.K


class TestCountMin:
    D, W = 4, 1 << 12

    def test_overestimate_only_and_invariance(self, spark, docs):
        from fatespark.sketch import cms_build, cms_query

        terms = docs.select(F.explode(F.split(F.trim("text"), r"\s+"))
                            .alias("term"))
        truth = {r["term"]: r["n"] for r in
                 terms.groupBy("term").agg(F.count("*").alias("n"))
                 .collect()}
        cms = cms_build(terms, "term", depth=self.D, width=self.W)
        probes = spark.createDataFrame(
            [(t,) for t in list(truth)[:200]] + [("zzz_never_seen",)],
            "term string")
        est = {r["term"]: r["est"] for r in cms_query(
            cms, probes, "term", depth=self.D, width=self.W).collect()}
        assert all(est[t] >= truth[t] for t in list(truth)[:200])
        # at this load (few k distinct into 4x4096 cells) estimates are
        # near-exact; the absent term reads its (possibly collided) cells
        assert est["zzz_never_seen"] >= 0
        # partition invariance of the cell table
        a = sorted(map(tuple, cms.collect()))
        b = sorted(map(tuple, cms_build(
            terms.repartition(13), "term",
            depth=self.D, width=self.W).collect()))
        assert a == b

    def test_shard_merge_equals_full_build(self, spark, docs):
        from fatespark.sketch import cms_build

        terms = docs.select(
            "doc_id", F.explode(F.split(F.trim("text"), r"\s+"))
            .alias("term"))
        full = cms_build(terms, "term", depth=self.D, width=self.W)
        h1 = cms_build(terms.filter(F.col("doc_id") % 2 == 0), "term",
                       depth=self.D, width=self.W)
        h2 = cms_build(terms.filter(F.col("doc_id") % 2 != 0), "term",
                       depth=self.D, width=self.W)
        merged = (h1.unionByName(h2).groupBy("j", "cell")
                  .agg(F.sum("n").alias("n")))
        assert sorted(map(tuple, full.collect())) \
            == sorted(map(tuple, merged.collect()))
