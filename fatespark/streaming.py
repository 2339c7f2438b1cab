"""Incremental indexing via Structured Streaming.

The reference's fragment abstraction exists to support incremental index
builds (``lib/fragment_writer.rb``; multi-fragment delta merge was declared
unsupported, ``README.markdown:95-96``). The Spark-native analogue: each
micro-batch becomes one build CHUNK — the same idempotent unit the
checkpoint/resume machinery already uses — appended under
``postings/chunk={epoch}`` with a manifest row, and ``finalize()``
republishes terms/meta. Readers opening the index between finalizes see the
previous published snapshot (meta is the publish marker), which mirrors the
reference's readers only seeing ``finish!``-renamed fragments.

Query-side nothing changes: cross-chunk block interleave is already handled
(TermBlocks re-blocks on load).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .build import IndexBuilder


class StreamingIndexer:
    """foreachBatch sink that indexes each micro-batch as a chunk."""

    def __init__(self, builder: IndexBuilder, *, url_col: str = "url",
                 id_col: str | None = None, text_col: str = "text",
                 build_id: str = "stream", finalize_every: int = 1):
        self.builder = builder
        self.url_col = url_col
        self.id_col = id_col
        self.text_col = text_col
        self.build_id = build_id
        self.finalize_every = max(1, finalize_every)
        self._epochs_done = 0

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.process_batch(batch_df, epoch_id)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        from pyspark.sql import functions as F
        b = self.builder
        if self.id_col is None:
            batch_df = batch_df.withColumn(
                "doc_id", F.xxhash64(F.col(self.url_col)))
            id_col = "doc_id"
        else:
            id_col = self.id_col
        # exactly-once per epoch: Structured Streaming may retry a batch;
        # the chunk write is an overwrite of chunk={epoch_id} and the
        # manifest records it done, so a retry is idempotent
        done = b.done_chunks(spark, self.build_id)
        if int(epoch_id) in done:
            return
        base = batch_df.select(
            F.col(id_col).alias("doc_id"),
            F.col(self.url_col if self.url_col in batch_df.columns
                  else id_col).cast("string").alias("url"),
            F.col(self.text_col).alias("text"))
        b._build_chunk(spark, base, chunk_id=int(epoch_id),
                       build_id=self.build_id)
        self._epochs_done += 1
        if self._epochs_done % self.finalize_every == 0:
            b._finalize(spark, build_id=self.build_id,
                        n_chunks=self._epochs_done)

    def finalize(self, spark: SparkSession) -> None:
        self.builder._finalize(spark, build_id=self.build_id,
                               n_chunks=self._epochs_done)


def index_stream(stream_df: DataFrame, builder: IndexBuilder, *,
                 checkpoint_dir: str, url_col: str = "url",
                 id_col: str | None = None, text_col: str = "text",
                 build_id: str = "stream", finalize_every: int = 1,
                 trigger: dict | None = None):
    """Start a Structured Streaming query writing index chunks per
    micro-batch. Returns (StreamingQuery, StreamingIndexer)."""
    sink = StreamingIndexer(builder, url_col=url_col, id_col=id_col,
                            text_col=text_col, build_id=build_id,
                            finalize_every=finalize_every)
    writer = (stream_df.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start(), sink
