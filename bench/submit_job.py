#!/usr/bin/env python
"""Job script for ``bench/submit.sh`` — runs via ``spark-submit --py-files
fatespark.zip`` from a scratch directory, so every ``import fatespark``
resolves through the shipped zip exactly as it would on a real cluster's
executors. Builds the index over a synthetic pages corpus and runs the
reference-style query set; prints ONE JSON line.

Usage: spark-submit --py-files /tmp/fatespark_pyfiles.zip submit_job.py [n]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

from pyspark.sql import SparkSession

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_df
from fatespark.query import SearchIndex


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = SparkSession.builder.appName("fatespark-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = f"/tmp/fatespark_submit_corpus_{n_pages}"
    try:
        spark.read.parquet(corpus_path).limit(1).collect()
    except Exception:
        pages_df(spark, n_pages, partitions=256).write.mode(
            "overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path).select("url", "text")

    idx_dir = "/tmp/fatespark_submit_idx"
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    totals = IndexBuilder(idx_dir, BuildConfig(
        n_buckets=8, salt_bits=1, block_size=128)).build(
        spark, corpus, build_id="submit")
    build_s = time.time() - t0

    idx = SearchIndex(spark, idx_dir)
    q = {}
    for name, (terms, mode, wand) in {
        "and2": (["the", "smith"], "AND", False),
        "or2": (["smith", "jones"], "OR", False),
        "or3_wand": (["the", "smith", "zyzzyva"], "OR", True),
    }.items():
        t0 = time.time()
        rows = idx.search(terms, k=10, mode=mode, use_wand=wand).collect()
        q[name] = {"secs": round(time.time() - t0, 3), "hits": len(rows)}

    print(json.dumps({
        "metric": "spark-submit --py-files index build + BM25 queries",
        "n_pages": n_pages, "build_secs": round(build_s, 2),
        "docs_per_sec": round(totals["docs"] / build_s, 1),
        "postings": totals["postings"], "queries": q,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
