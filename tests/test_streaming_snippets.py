"""Incremental (streaming) indexing + snippet extraction."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_df, pages_pandas
from fatespark.oracle import BM25Oracle
from fatespark.query import SearchIndex, snippets
from fatespark.streaming import StreamingIndexer


class TestStreamingIndexer:
    def test_microbatches_equal_batch_build(self, spark, tmp_root):
        """Feeding the corpus as 3 'micro-batches' through the streaming sink
        must produce the same query results as one batch build."""
        n = 150
        corpus = pages_df(spark, n, partitions=4).cache()
        # batch reference build
        ref_dir = str(tmp_root / "stream_ref")
        IndexBuilder(ref_dir, BuildConfig(n_buckets=4, salt_bits=0)).build(
            spark, corpus, build_id="ref")
        ref = SearchIndex(spark, ref_dir)

        # streaming build: 3 epochs
        st_dir = str(tmp_root / "stream_idx")
        sink = StreamingIndexer(
            IndexBuilder(st_dir, BuildConfig(n_buckets=4, salt_bits=0)),
            build_id="s1", finalize_every=100)
        full = corpus.withColumn("part", F.pmod(F.xxhash64("url"), F.lit(3)))
        for epoch in range(3):
            sink.process_batch(full.filter(F.col("part") == epoch), epoch)
        sink.finalize(spark)

        idx = SearchIndex(spark, st_dir)
        assert idx.n_docs == ref.n_docs and idx.avgdl == ref.avgdl
        for q, mode in [("the smith", "AND"), ("smith jones", "OR")]:
            got = [(r["doc_id"], r["score"]) for r in idx.search(q, mode=mode).collect()]
            exp = [(r["doc_id"], r["score"]) for r in ref.search(q, mode=mode).collect()]
            assert got == exp, q
        corpus.unpersist()

    def test_epoch_retry_is_idempotent(self, spark, tmp_root):
        n = 60
        corpus = pages_df(spark, n, partitions=2)
        st_dir = str(tmp_root / "stream_retry")
        sink = StreamingIndexer(
            IndexBuilder(st_dir, BuildConfig(n_buckets=2, salt_bits=0)),
            build_id="s2", finalize_every=100)
        sink.process_batch(corpus, 0)
        sink.finalize(spark)
        # Structured Streaming may re-deliver the same epoch after a crash
        sink.process_batch(corpus, 0)  # must be a no-op, not a dup-doc error
        idx = SearchIndex(spark, st_dir)
        assert idx.n_docs == n


class TestSnippets:
    def test_snippet_contains_term(self, spark, tmp_root):
        idx_dir = str(tmp_root / "snip_idx")
        corpus = pages_df(spark, 120, partitions=2).withColumn(
            "doc_id", F.xxhash64("url")).cache()
        IndexBuilder(idx_dir, BuildConfig(n_buckets=2, salt_bits=0)).build(
            spark, corpus, id_col="doc_id", build_id="sn")
        idx = SearchIndex(spark, idx_dir)
        res = idx.search("smith", k=5, mode="OR")
        out = snippets(res, corpus, "smith", size=20).collect()
        assert len(out) == 5
        for r in out:
            assert "smith" in r["snippet"].lower()
            assert len(r["snippet"]) <= 40
        corpus.unpersist()

    def test_snippet_empty_when_no_literal_match(self, spark):
        corpus = spark.createDataFrame([(1, "alpha beta", 0.5)],
                                       "doc_id long, text string, score double")
        res = corpus.select("doc_id", "score")
        out = snippets(res, corpus.select("doc_id", "text"), "gamma").collect()
        assert out[0]["snippet"] == ""


class TestStreamingTermStats:
    def test_stateful_stats_match_batch_recompute(self, spark, tmp_root):
        import numpy as np
        import pandas as pd
        from pyspark.sql import functions as F

        from fatespark.corpus import pages_pandas
        from fatespark.streaming import streaming_term_stats

        src = str(tmp_root / "sts_src")
        # two files -> two micro-batches with maxFilesPerTrigger=1
        for i, lo in enumerate([0, 600]):
            pdf = pages_pandas(np.arange(lo, lo + 600))
            pdf["doc_id"] = np.arange(lo, lo + 600, dtype=np.int64)
            sdf = spark.createDataFrame(pdf[["doc_id", "text"]])
            sdf.coalesce(1).write.mode("append").parquet(src)

        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", "1").parquet(src))
        out = streaming_term_stats(stream, salt_bits=1)
        q = (out.writeStream.format("memory").queryName("sts")
             .outputMode("update")
             .option("checkpointLocation", str(tmp_root / "sts_ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

        # last update per (term, salt) wins; df is monotone so max == last
        final = (spark.table("sts").groupBy("term", "salt")
                 .agg(F.max("df").alias("df"), F.max("cf").alias("cf"))
                 .groupBy("term")
                 .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf")))
        got = {r["term"]: (r["df"], r["cf"]) for r in final.collect()}

        from fatespark.analysis import analyze
        pdf = pages_pandas(np.arange(0, 1200))
        exp: dict[str, list[int]] = {}
        for text in pdf["text"]:
            toks = analyze(text)
            for t in set(toks):
                e = exp.setdefault(t, [0, 0])
                e[0] += 1
            for t in toks:
                exp[t][1] += 1
        assert len(got) == len(exp)
        for t, (df, cf) in exp.items():
            assert got[t] == (df, cf), t


class TestStreamingKmv:
    def test_stream_sketch_matches_batch_sketch(self, spark, tmp_root):
        """Two micro-batches of (domain, url) rows through the stateful KMV
        operator must end at exactly the batch sketch of the unioned rows —
        same n_kept, same est_distinct, per group."""
        import pandas as pd
        from pyspark.sql import functions as F

        from fatespark.sketch import kmv_distinct_df
        from fatespark.streaming import streaming_kmv_distinct

        src = str(tmp_root / "kmv_src")
        # batch 0: groups a (300 distinct) and b (50 distinct)
        # batch 1: more of a (overlapping + new), b duplicates only
        batches = [
            pd.DataFrame({"g": ["a"] * 300 + ["b"] * 50,
                          "v": [f"u{i}" for i in range(300)]
                          + [f"w{i}" for i in range(50)]}),
            pd.DataFrame({"g": ["a"] * 200 + ["b"] * 50,
                          "v": [f"u{i}" for i in range(150, 350)]
                          + [f"w{i}" for i in range(50)]}),
        ]
        for pdf in batches:
            (spark.createDataFrame(pdf).coalesce(1)
             .write.mode("append").parquet(src))

        stream = (spark.readStream.schema("g string, v string")
                  .option("maxFilesPerTrigger", "1").parquet(src))
        out = streaming_kmv_distinct(stream, "g", "v", k=128)
        q = (out.writeStream.format("memory").queryName("kmv_stream")
             .outputMode("update")
             .option("checkpointLocation", str(tmp_root / "kmv_ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

        # n_kept and est_distinct are monotone -> latest == max per group
        got = {r["g"]: (r["n_kept"], r["est"]) for r in
               (spark.table("kmv_stream").groupBy("g")
                .agg(F.max("n_kept").alias("n_kept"),
                     F.max("est_distinct").alias("est"))).collect()}

        full = spark.read.parquet(src)
        exp = {r["g"]: (r["n_kept"], r["est_distinct"]) for r in
               kmv_distinct_df(full, "g", "v", k=128).collect()}
        assert got == exp
        # group a crossed k=128 (350 distinct) -> estimator branch;
        # group b stayed below (50 distinct) -> exact branch
        assert exp["b"] == (50, 50)
        assert exp["a"][0] == 128


class TestIndexStream:
    def test_readstream_build_converges_to_batch(self, spark, tmp_root):
        """End-to-end Structured Streaming build: a real file-source
        readStream (maxFilesPerTrigger=1 -> one chunk per micro-batch)
        through index_stream + finalize must produce the same index as a
        one-shot batch build of the full corpus — counts, stats, and a
        ranked query compared directly."""
        import numpy as np
        from pyspark.sql import functions as F

        from fatespark.build import BuildConfig, IndexBuilder
        from fatespark.corpus import pages_pandas
        from fatespark.query import SearchIndex
        from fatespark.streaming import index_stream

        src = str(tmp_root / "istream_src")
        for lo in (0, 400):
            pdf = pages_pandas(np.arange(lo, lo + 400))
            pdf["doc_id"] = np.arange(lo, lo + 400, dtype=np.int64)
            (spark.createDataFrame(pdf[["doc_id", "url", "text"]])
             .coalesce(1).write.mode("append").parquet(src))

        sdir = str(tmp_root / "istream_idx")
        stream = (spark.readStream.schema("doc_id long, url string, text string")
                  .option("maxFilesPerTrigger", "1").parquet(src))
        b = IndexBuilder(sdir, BuildConfig(n_buckets=4, salt_bits=1))
        q, sink = index_stream(
            stream, b, checkpoint_dir=str(tmp_root / "istream_ckpt"),
            url_col="url", id_col="doc_id",
            finalize_every=10 ** 9, trigger={"availableNow": True})
        q.awaitTermination(180)
        sink.finalize(spark)
        assert sink._epochs_done == 2  # two files -> two chunks

        bdir = str(tmp_root / "istream_batch_idx")
        full = spark.read.parquet(src)
        IndexBuilder(bdir, BuildConfig(n_buckets=4, salt_bits=1)).build(
            spark, full, id_col="doc_id", url_col="url", build_id="batch")

        si = SearchIndex(spark, sdir)
        bi = SearchIndex(spark, bdir)
        assert si.n_docs == bi.n_docs == 800
        assert si.avgdl == bi.avgdl
        for t in ("the", "smith", "fat_entry"):
            assert si.count(t) == bi.count(t), t
            assert si.count_occurrences(t) == bi.count_occurrences(t), t
        a = [(r["doc_id"], r["score"]) for r in
             si.search(["the", "smith"], k=10, mode="AND").collect()]
        c = [(r["doc_id"], r["score"]) for r in
             bi.search(["the", "smith"], k=10, mode="AND").collect()]
        assert a == c and len(a) == 10
