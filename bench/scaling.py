#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: throughput scaling efficiency
>= 0.8 between N and 4N executors, evidenced in this sandbox as local[8] vs
local[32] on identical input).

Materializes the synthetic pages corpus to parquet once, then runs the full
index build (scan -> tokenize -> salted merge -> write) at each parallelism,
with shuffle partitions and input splits scaled to the core count. Prints one
JSON line and appends a row to BENCH.md.

Usage: python bench/scaling.py [n_pages]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def run_once(cpus: int, corpus_path: str, n_pages: int) -> dict:
    from pyspark.sql import SparkSession

    from fatespark.build import BuildConfig, IndexBuilder

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName(f"fatespark-scale-{cpus}")
             .config("spark.sql.shuffle.partitions", str(cpus * 2))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEM", "48g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    idx_dir = f"/tmp/fatespark_scale_idx_{cpus}"
    # project to the indexed columns BEFORE any movement — repartitioning the
    # full rows would shuffle the html payload for nothing
    corpus = spark.read.parquet(corpus_path).select("url", "text")
    cfg = BuildConfig(n_buckets=16, salt_bits=1, block_size=128)
    # warm-up: JIT, python-worker spin-up, parquet page cache — untimed
    shutil.rmtree(idx_dir, ignore_errors=True)
    IndexBuilder(idx_dir, cfg).build(spark, corpus.limit(5000),
                                     build_id="warmup")
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    IndexBuilder(idx_dir, cfg).build(spark, corpus, build_id=f"scale{cpus}")
    secs = time.time() - t0

    # query batch at this parallelism
    from fatespark.query import SearchIndex
    idx = SearchIndex(spark, idx_dir)
    tq = time.time()
    for q, mode in [(["the", "smith"], "AND"), (["smith", "jones"], "OR"),
                    (["the", "smith", "zyzzyva"], "OR")]:
        idx.search(q, k=10, mode=mode).collect()
    q_secs = time.time() - tq
    spark.stop()
    return {"cpus": cpus, "build_secs": round(secs, 2),
            "docs_per_sec": round(n_pages / secs, 1),
            "query_batch_secs": round(q_secs, 2)}


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("FATESPARK_SCALE_PAGES", "200000"))

    corpus_path = f"/tmp/fatespark_scale_corpus_{n_pages}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        from fatespark.corpus import pages_df
        from fatespark.session import get_spark
        spark = get_spark(cpus=32, app="fatespark-scale-gen")
        spark.sparkContext.setLogLevel("ERROR")
        pages_df(spark, n_pages, partitions=96).write.mode("overwrite").parquet(
            corpus_path)
        spark.stop()

    lo = run_once(8, corpus_path, n_pages)
    hi = run_once(32, corpus_path, n_pages)
    speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
    eff = speedup / (32 / 8)
    out = {"metric": "index-build scaling efficiency (local[8] vs local[32])",
           "n_pages": n_pages, "low": lo, "high": hi,
           "speedup": round(speedup, 3), "efficiency": round(eff, 3)}
    print(json.dumps(out))

    row = (f"| {n_pages} | {lo['build_secs']} | {lo['docs_per_sec']} | "
           f"{hi['build_secs']} | {hi['docs_per_sec']} | "
           f"{round(speedup, 3)}x | {round(eff, 3)} |\n")
    bench_md = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH.md")
    header = ("\n## Scaling (local[8] vs local[32], identical parquet input)\n\n"
              "| pages | t@8 (s) | docs/s@8 | t@32 (s) | docs/s@32 | speedup "
              "| efficiency (/4) |\n|---|---|---|---|---|---|---|\n")
    if not os.path.exists(bench_md):
        with open(bench_md, "w") as f:
            f.write("# BENCH — measured numbers\n" + header + row)
    else:
        with open(bench_md, "a") as f:
            f.write(row)


if __name__ == "__main__":
    main()
