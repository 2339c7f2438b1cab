"""HyperLogLog: rho extraction, merge law, both estimator branches,
partitioning invariance."""

import hashlib

import pytest
from pyspark.sql import functions as F

from fatespark.sketch import (hll_alpha, hll_distinct_df, hll_estimate_df,
                              hll_merge_states, hll_rho_col, hll_state_df)


def py_rho(value, p, seed="hll"):
    h = int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:15], 16)
    w = 60 - p
    bucket = h >> w
    suffix = h & ((1 << w) - 1)
    if suffix == 0:
        return bucket, w + 1
    return bucket, w - suffix.bit_length() + 1


@pytest.fixture(scope="module")
def vals(spark):
    return spark.createDataFrame(
        [("g", f"v{i}") for i in range(5000)], "g string, v string")


def test_rho_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(f"v{i}",) for i in range(500)], "v string")
    b, r = hll_rho_col("v", p=12)
    rows = df.select("v", b.alias("b"), r.alias("r")).collect()
    for row in rows:
        assert (row["b"], row["r"]) == py_rho(row["v"], 12)


def test_p_validation(spark):
    with pytest.raises(ValueError):
        hll_rho_col("v", p=6)
    with pytest.raises(ValueError):
        hll_rho_col("v", p=17)


def test_merge_equals_union_state(spark, vals):
    a = vals.filter(F.col("v") < "v3")
    b = vals.filter(F.col("v") >= "v2")     # overlapping halves
    merged = hll_merge_states(hll_state_df(a, "g", "v"),
                              hll_state_df(b, "g", "v"))
    direct = hll_state_df(vals, "g", "v")
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_linear_counting_branch_small(spark):
    """Tiny cardinality -> linear counting, which is near-exact."""
    df = spark.createDataFrame(
        [("g", f"x{i}") for i in range(50)], "g string, v string")
    r = hll_distinct_df(df, "g", "v", p=12).collect()[0]
    assert r["n_regs"] <= 50 and r["v_zero"] == 4096 - r["n_regs"]
    assert abs(r["est"] - 50) / 50 < 0.05


def test_raw_branch_and_accuracy(spark, vals):
    """5000 distinct at p=7 (m=128): raw harmonic estimator, ~1.04/sqrt(128)
    = 9% expected relative error — assert within 25%."""
    r = hll_distinct_df(vals, "g", "v", p=7).collect()[0]
    assert r["v_zero"] == 0                 # every register hit -> raw path
    assert abs(r["est"] - 5000) / 5000 < 0.25


def test_duplicates_do_not_move_the_estimate(spark, vals):
    doubled = vals.unionByName(vals)
    a = hll_distinct_df(vals, "g", "v", p=10).collect()[0]
    b = hll_distinct_df(doubled, "g", "v", p=10).collect()[0]
    assert tuple(a) == tuple(b)


def test_partitioning_invariance_bitwise(spark, vals):
    """The ordered dyadic fold makes the float estimate identical across
    partitionings — not just close."""
    a = hll_distinct_df(vals, "g", "v", p=9).collect()[0]
    b = hll_distinct_df(vals.repartition(13, "v"), "g", "v", p=9).collect()[0]
    assert a["est"] == b["est"] and tuple(a) == tuple(b)


def test_alpha_table():
    assert hll_alpha(16) == 0.673
    assert hll_alpha(64) == 0.709
    assert abs(hll_alpha(4096) - 0.7213 / (1 + 1.079 / 4096)) == 0
