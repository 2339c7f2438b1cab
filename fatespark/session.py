"""SparkSession factory tuned for this engine (local-mode testing; the same
configs apply to cluster spark-submit — see BENCH.md for the measured
rationale behind each knob)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(cpus: int | None = None, app: str = "fatespark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 4 shuffle partitions per core: the merge stage's python tasks are the
    # heaviest in the build, and one-wave stages (partitions == cores) lose
    # ~2x to the straggler tail (measured, BENCH.md)
    sp = shuffle_partitions or max(cpus * 4, 8)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        # AQE post-shuffle coalescing packs the python merge stage into
        # ~1.2 waves (e.g. 37 tasks on 32 cores) and the straggler tail
        # idles the cluster; with fine fixed partitions packing is even.
        # On a real cluster with dynamic allocation, re-enable it.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # keep input splits small enough for >=4 tasks/core on bench corpora
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    # local mode: shuffle + spill on tmpfs — models per-node NVMe/ramdisk
    # shuffle dirs on a real cluster, where shuffle bandwidth scales with
    # node count instead of bottlenecking on one /tmp disk
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/fatespark-spark-local"
        os.makedirs(d, exist_ok=True)
        b = b.config("spark.local.dir", d)
    return b.getOrCreate()


def warm_python_workers(spark: SparkSession, cpus: int) -> None:
    """Spawn and warm one python UDF worker per core (pandas/numpy imports)
    so the first measured job doesn't pay the cold-start."""
    import pandas as pd

    def gen(it):
        for p in it:
            yield pd.DataFrame({"x": p["id"][:1]})

    spark.range(0, cpus * 4, 1, cpus * 4).mapInPandas(gen, "x long").count()
