"""KMV distinct sketch: exactness below k, accuracy above k, merge law."""

import pytest
from pyspark.sql import functions as F

from fatespark.sketch import (kmv_distinct_df, kmv_merge_states,
                              kmv_state_df)


@pytest.fixture(scope="module")
def vals(spark):
    # group 'small': 100 distinct values (< k) with duplicates
    # group 'big': 20_000 distinct values (>> k)
    rows = [("small", f"s{i % 100}") for i in range(300)]
    rows += [("big", f"b{i}") for i in range(20_000)]
    rows += [("big", f"b{i}") for i in range(500)]   # duplicates
    return spark.createDataFrame(rows, "g string, v string")


def test_exact_below_k(vals):
    out = {r["g"]: r for r in
           kmv_distinct_df(vals, "g", "v", k=256).collect()}
    assert out["small"]["n_kept"] == 100
    assert out["small"]["est_distinct"] == 100  # exact branch


def test_estimate_accuracy(vals):
    out = {r["g"]: r for r in
           kmv_distinct_df(vals, "g", "v", k=256).collect()}
    est = out["big"]["est_distinct"]
    # KMV relative error ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(est - 20_000) / 20_000 < 0.25, est


def test_duplicates_do_not_inflate(spark):
    a = spark.createDataFrame([("g", f"v{i}") for i in range(5000)],
                              "g string, v string")
    b = a.unionByName(a).unionByName(a)
    ea = kmv_distinct_df(a, "g", "v", k=128).collect()[0]["est_distinct"]
    eb = kmv_distinct_df(b, "g", "v", k=128).collect()[0]["est_distinct"]
    assert ea == eb


def test_partition_independence(vals):
    a = sorted(map(tuple, kmv_distinct_df(vals, "g", "v", k=64).collect()))
    b = sorted(map(tuple, kmv_distinct_df(vals.repartition(17), "g", "v",
                                          k=64).collect()))
    assert a == b


def test_merge_law(spark, vals):
    """Estimating from merged half-sketches == sketching the whole."""
    k = 128
    left = vals.filter(F.crc32(F.col("v")) % 2 == 0)
    right = vals.filter(F.crc32(F.col("v")) % 2 == 1)
    merged = kmv_merge_states(kmv_state_df(left, "g", "v", k=k),
                              kmv_state_df(right, "g", "v", k=k),
                              "g", k=k)
    whole = {r["g"]: r["minima"] for r in
             kmv_state_df(vals, "g", "v", k=k).collect()}
    for r in merged.collect():
        assert list(r["minima"]) == list(whole[r["g"]]), r["g"]
