"""Index build orchestration: docs table, stats, chunked checkpoint/resume,
lineage + per-partition metrics.

Layout of an index directory (parquet today; each table maps 1:1 onto an
Iceberg table on a real cluster — the seam is `_read`/`_write` below):

    {dir}/docs/chunk={c}/           (doc_id, bucket, url, dl)
    {dir}/postings/chunk={c}/bucket={b}/   posting blocks (merge.BLOCK_SCHEMA)
    {dir}/terms/                    (term, df, cf, max_tf, n_blocks)
    {dir}/meta/                     single row: corpus stats + build params
    {dir}/manifest/                 per-chunk lineage: status, docs/sec, ...
    {dir}/bucket_metrics/           per (chunk, bucket): postings, bytes

Checkpoint/resume (north_rule): each chunk is an idempotent unit — its
docs/postings land under chunk-suffixed paths, then a 'done' manifest row is
appended. A restarted build with ``resume=True`` skips chunks already 'done';
a chunk that crashed mid-write is simply overwritten. ``meta`` is written
last and is the publish marker readers require (the atomic-rename analogue of
the reference's tmpdir + ``File.rename`` publish, ``lib/fragment_writer.rb:
22-26,45-52``; on Iceberg this is the snapshot commit).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ids import bucket_of
from .merge import merge_segments
from .segments import build_segments

# ASCII whitespace for the JVM-side doc-length expression; must match
# analysis.WS_TOKEN_RE exactly (\x0B spelled out — Java's \v differs).
WS_SPLIT_RE = "[ \\t\\n\\r\\f\\x0B]+"


def doclen_col(text_col: str):
    """JVM-side token count, byte-equal to analysis.doc_length (no UDF)."""
    return F.size(F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")),
                                   WS_SPLIT_RE),
                           lambda x: x != F.lit("")))


def _bucket_udf(n_buckets: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def fn(ids: pd.Series) -> pd.Series:
        return pd.Series(bucket_of(ids.to_numpy("int64"), n_buckets))
    return fn


@dataclass
class BuildConfig:
    n_buckets: int = 8
    salt_bits: int = 2
    block_size: int = 128
    analyzer: str = "whitespace"
    store_positions: bool = True
    on_duplicate: str = "error"


@dataclass
class IndexBuilder:
    index_dir: str
    config: BuildConfig = field(default_factory=BuildConfig)

    # -- paths -------------------------------------------------------------
    def _p(self, name: str) -> str:
        return os.path.join(self.index_dir, name)

    # -- lineage -----------------------------------------------------------
    def _manifest(self, spark: SparkSession) -> pd.DataFrame | None:
        path = self._p("manifest")
        try:
            return spark.read.parquet(path).toPandas()
        except Exception:
            return None

    def _append_manifest(self, spark: SparkSession, row: dict) -> None:
        pdf = pd.DataFrame([row])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
            self._p("manifest"))

    def done_chunks(self, spark: SparkSession, build_id: str) -> set[int]:
        m = self._manifest(spark)
        if m is None or m.empty:
            return set()
        m = m[(m["build_id"] == build_id) & (m["status"] == "done")]
        return set(m["chunk_id"].astype(int))

    # -- build -------------------------------------------------------------
    def build(self, spark: SparkSession, df: DataFrame, *,
              url_col: str = "url", id_col: str | None = None,
              text_col: str = "text", build_id: str = "b0001",
              resume: bool = False, n_chunks: int = 1,
              chunk_col: str | None = None) -> dict:
        """Build (or resume) the index from a corpus DataFrame.

        doc_id: ``xxhash64(url)`` (deterministic, collision-checked at merge)
        unless ``id_col`` names an existing unique bigint column.
        Chunking: rows are split by ``pmod(xxhash64(doc_id), n_chunks)`` (or a
        caller-provided ``chunk_col``) and each chunk is built + committed
        independently for checkpoint/resume.
        """
        cfg = self.config
        if id_col is None:
            df = df.withColumn("doc_id", F.xxhash64(F.col(url_col)))
            id_col = "doc_id"
        keep_url = url_col if url_col in df.columns else id_col
        base = df.select(
            F.col(id_col).alias("doc_id"),
            F.col(keep_url).cast("string").alias("url"),
            F.col(text_col).alias("text"),
        )
        if n_chunks > 1:
            ck = F.col(chunk_col) if chunk_col else F.pmod(
                F.xxhash64(F.col("doc_id")), F.lit(n_chunks))
            base = base.withColumn("_chunk", ck.cast("int"))

        done = self.done_chunks(spark, build_id) if resume else set()
        totals = {"docs": 0, "postings": 0, "bytes": 0, "secs": 0.0,
                  "chunks_skipped": len(done)}
        for c in range(n_chunks):
            if c in done:
                continue
            chunk_df = base.filter(F.col("_chunk") == c) if n_chunks > 1 else base
            stats = self._build_chunk(spark, chunk_df, chunk_id=c,
                                      build_id=build_id)
            for k in ("docs", "postings", "bytes"):
                totals[k] += stats[k]
            totals["secs"] += stats["secs"]

        self._finalize(spark, build_id=build_id, n_chunks=n_chunks)
        return totals

    def _build_chunk(self, spark: SparkSession, chunk_df: DataFrame, *,
                     chunk_id: int, build_id: str) -> dict:
        cfg = self.config
        t0 = time.time()
        docs = (chunk_df
                .withColumn("dl", doclen_col("text"))
                .withColumn("bucket", _bucket_udf(cfg.n_buckets)("doc_id"))
                .select("doc_id", "bucket", "url", "dl"))
        docs.write.mode("overwrite").parquet(
            self._p(f"docs/chunk={chunk_id}"))

        segments = build_segments(
            chunk_df, n_buckets=cfg.n_buckets, salt_bits=cfg.salt_bits,
            analyzer=cfg.analyzer, store_positions=cfg.store_positions)
        blocks = merge_segments(segments, block_size=cfg.block_size,
                                on_duplicate=cfg.on_duplicate)
        (blocks
         .repartition("bucket")
         .sortWithinPartitions("bucket", "term", "first_doc")
         .write.mode("overwrite").partitionBy("bucket")
         .parquet(self._p(f"postings/chunk={chunk_id}")))

        # per-partition (bucket) metrics from the written blocks — one cheap
        # columnar scan, no re-tokenize
        written = spark.read.parquet(self._p(f"postings/chunk={chunk_id}"))
        bm = (written.groupBy("bucket")
              .agg(F.sum("n").alias("postings"), F.count("*").alias("blocks"),
                   (F.sum(F.octet_length("docs")) + F.sum(F.octet_length("tfs"))
                    + F.sum(F.octet_length("dls"))
                    + F.sum(F.octet_length("poss"))).alias("bytes"))
              .withColumn("chunk_id", F.lit(chunk_id))
              .withColumn("build_id", F.lit(build_id))).cache()
        bm.coalesce(1).write.mode("append").parquet(self._p("bucket_metrics"))
        agg = bm.agg(F.sum("postings"), F.sum("bytes")).collect()[0]
        bm.unpersist()
        n_docs = spark.read.parquet(self._p(f"docs/chunk={chunk_id}")).count()
        secs = time.time() - t0
        row = {
            "build_id": build_id, "chunk_id": chunk_id, "status": "done",
            "docs": n_docs, "postings": int(agg[0] or 0),
            "bytes": int(agg[1] or 0), "secs": float(secs),
            "docs_per_sec": float(n_docs / secs) if secs > 0 else 0.0,
            "postings_per_sec": float((agg[0] or 0) / secs) if secs > 0 else 0.0,
        }
        self._append_manifest(spark, row)
        return row

    def _finalize(self, spark: SparkSession, *, build_id: str,
                  n_chunks: int) -> None:
        cfg = self.config
        blocks = spark.read.parquet(self._p("postings"))
        terms = (blocks.groupBy("term")
                 .agg(F.sum("n").alias("df"), F.sum("sum_tf").alias("cf"),
                      F.max("max_tf").alias("max_tf"),
                      F.count("*").alias("n_blocks")))
        (terms.repartitionByRange(max(1, cfg.n_buckets // 4), "term")
         .sortWithinPartitions("term")
         .write.mode("overwrite").parquet(self._p("terms")))

        docs = spark.read.parquet(self._p("docs"))
        agg = docs.agg(F.count("*").alias("n"), F.sum("dl").alias("s")).collect()[0]
        n_docs, sum_dl = int(agg["n"]), int(agg["s"] or 0)
        meta = pd.DataFrame([{
            "n_docs": n_docs, "sum_dl": sum_dl,
            "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
            "n_buckets": cfg.n_buckets, "salt_bits": cfg.salt_bits,
            "block_size": cfg.block_size, "analyzer": cfg.analyzer,
            "store_positions": cfg.store_positions,
            "build_id": build_id, "n_chunks": n_chunks,
        }])
        # publish marker: written last, required by SearchIndex.load
        spark.createDataFrame(meta).coalesce(1).write.mode("overwrite").parquet(
            self._p("meta"))
