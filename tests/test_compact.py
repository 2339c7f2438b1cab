"""Tiered partial compaction (IndexBuilder.compact_chunks): fold the
smallest build chunks into one, leave the big ones alone — the Lucene
TieredMergePolicy analogue for continuous-ingest maintenance.

Invariants tested: query results bit-identical pre/post, chunk count
reduced to the policy target, largest chunk untouched, pre-compaction
snapshot still time-travels, later epochs still append, vacuum after
compaction still consolidates."""

import glob
import os

import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.query import SearchIndex
from fatespark import snapshots


def _texts(i):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    return " ".join(words[(i * 7 + j) % 6] for j in range(4 + i % 5))


@pytest.fixture()
def chunked(spark, tmp_path):
    d = str(tmp_path / "compact_idx")
    df = spark.createDataFrame([(i, _texts(i)) for i in range(300)],
                               "doc_id long, text string")
    b = IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0))
    # 6 chunks of very different sizes (split by doc_id range via chunk_col)
    from pyspark.sql import functions as F
    ck = (F.when(F.col("doc_id") < 200, 0)   # one big chunk
          .otherwise(((F.col("doc_id") - 200) / 20).cast("int") + 1))
    b.build(spark, df.withColumn("_chunk", ck), id_col="doc_id",
            url_col="doc_id", text_col="text", build_id="c0",
            n_chunks=6, chunk_col="_chunk")
    return d, b


def _chunks(d):
    return sorted(int(p.rsplit("=", 1)[1]) for p in
                  glob.glob(os.path.join(d, "postings", "chunk=*")))


class TestCompactChunks:
    def test_results_identical_and_tiered(self, spark, chunked):
        d, b = chunked
        idx = SearchIndex(spark, d)
        before = idx.search(["alpha", "gamma"], k=20, mode="OR").collect()
        stats_before = (idx.n_docs, idx.avgdl)
        pre_snap = snapshots.current_id(d)
        assert _chunks(d) == [0, 1, 2, 3, 4, 5]

        r = b.compact_chunks(spark, max_chunks=2)
        assert r["chunks_before"] == 6 and r["chunks_after"] == 2
        assert r["compacted"] == 5 and r["new_chunk"] == -2
        # the big chunk (0) is untouched; the 5 small ones folded into -2
        assert _chunks(d) == [-2, 0]

        idx2 = SearchIndex(spark, d)
        assert (idx2.n_docs, idx2.avgdl) == stats_before
        after = idx2.search(["alpha", "gamma"], k=20, mode="OR").collect()
        assert [(x["doc_id"], x["score"]) for x in after] == \
            [(x["doc_id"], x["score"]) for x in before]

        # pre-compaction snapshot still readable (archived, not deleted)
        old = SearchIndex(spark, d, snapshot_id=pre_snap)
        trav = old.search(["alpha", "gamma"], k=20, mode="OR").collect()
        assert [(x["doc_id"], x["score"]) for x in trav] == \
            [(x["doc_id"], x["score"]) for x in before]

    def test_noop_under_target(self, spark, chunked):
        d, b = chunked
        r = b.compact_chunks(spark, max_chunks=6)
        assert r["compacted"] == 0 and _chunks(d) == [0, 1, 2, 3, 4, 5]

    def test_epoch_append_and_vacuum_after(self, spark, chunked):
        d, b = chunked
        b.compact_chunks(spark, max_chunks=2)
        # a later incremental epoch appends cleanly next to chunk=-2
        df = spark.createDataFrame([(1000 + i, _texts(i)) for i in range(20)],
                                   "doc_id long, text string")
        from fatespark.streaming import StreamingIndexer
        si = StreamingIndexer(b, url_col="doc_id", id_col="doc_id",
                              text_col="text", build_id="ep",
                              finalize_every=10**9)
        si.process_batch(df, 7)
        si.finalize(spark)
        idx = SearchIndex(spark, d)
        assert idx.n_docs == 320
        assert set(_chunks(d)) == {-2, 0, 7}
        # second compaction picks a fresh reserved id below -2
        r2 = b.compact_chunks(spark, max_chunks=1)
        assert r2["new_chunk"] == -3 and _chunks(d) == [-3]
        # and vacuum still fully consolidates afterwards
        b.delete_docs(spark, [0, 1, 2])
        v = b.vacuum(spark)
        assert v["dropped"] == 3
        idx3 = SearchIndex(spark, d)
        assert idx3.n_docs == 317
