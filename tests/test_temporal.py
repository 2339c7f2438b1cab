"""As-of join and interval join vs brute-force / pandas oracles.

The asof contract under test is pandas ``merge_asof`` (by-key,
backward/forward, allow-exact, tolerance) — the de-facto public spec —
plus the dup-ts tiebreak pandas doesn't define (we pin largest-tiebreak
and check it against a brute-force scan). Interval join checks against
the O(n*m) cartesian filter. A plan test asserts the asof union plan
shuffles ONCE and the interval plan contains no cartesian product.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fatespark.temporal import asof_join, interval_join


def _mk_events(seed, n, n_keys, dup_ts=False):
    rng = np.random.RandomState(seed)
    ts = rng.randint(0, 10_000, size=n) * 1_000_000  # whole seconds, us
    if dup_ts:
        ts = (rng.randint(0, 50, size=n)) * 1_000_000  # force collisions
    return pd.DataFrame({
        "k": rng.randint(0, n_keys, size=n),
        "ts": pd.to_datetime(ts, unit="us"),
        "rid": np.arange(n),
        "val": rng.rand(n).round(6),
    })


def _spark_df(spark, pdf):
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_matches_pandas(spark, direction, allow_exact):
    left = _mk_events(1, 400, 7)
    right = _mk_events(2, 300, 7).rename(columns={"rid": "qid"})
    # pandas merge_asof needs globally sorted frames and unique right ts
    # per key for a deterministic answer
    right = right.drop_duplicates(subset=["k", "ts"], keep="last")
    got = asof_join(
        _spark_df(spark, left), _spark_df(spark, right), on=["k"],
        right_cols=["qid", "val"], direction=direction,
        allow_exact=allow_exact, suffix="_r", tiebreak="qid",
    ).toPandas().sort_values("rid").reset_index(drop=True)

    exp = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts", by="k", direction=direction,
        allow_exact_matches=allow_exact, suffixes=("", "_r"),
    ).sort_values("rid").reset_index(drop=True)

    assert got["rid"].tolist() == exp["rid"].tolist()
    # qid identifies the matched right row uniquely, so matching qids
    # means matching matched-ts too
    assert (got["qid_r"].fillna(-1).astype("int64").tolist()
            == exp["qid"].fillna(-1).astype("int64").tolist())


def test_asof_tolerance_and_inner(spark):
    left = _mk_events(3, 300, 5)
    right = _mk_events(4, 200, 5).rename(columns={"rid": "qid"})
    right = right.drop_duplicates(subset=["k", "ts"], keep="last")
    tol = 500 * 1_000_000  # 500 s
    got = asof_join(
        _spark_df(spark, left), _spark_df(spark, right), on=["k"],
        right_cols=["qid"], tolerance_us=tol, how="inner",
        suffix="_r", tiebreak="qid",
    ).toPandas().sort_values("rid").reset_index(drop=True)
    exp = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts", by="k", direction="backward",
        tolerance=pd.Timedelta(seconds=500), suffixes=("", "_r"))
    exp = exp[exp["qid"].notna()].sort_values("rid")
    assert got["rid"].tolist() == exp["rid"].tolist()
    assert got["qid_r"].astype("int64").tolist() == \
        exp["qid"].astype("int64").tolist()


def test_asof_dup_ts_tiebreak_largest(spark):
    # several right rows per (k, ts): the largest tiebreak must win
    left = _mk_events(5, 200, 3, dup_ts=True)
    right = _mk_events(6, 400, 3, dup_ts=True).rename(columns={"rid": "qid"})
    got = asof_join(
        _spark_df(spark, left), _spark_df(spark, right), on=["k"],
        right_cols=["qid"], suffix="_r", tiebreak="qid",
    ).toPandas().set_index("rid")
    lus = left["ts"].astype("int64") // 1000
    rus = right["ts"].astype("int64") // 1000
    for _, lrow in left.iterrows():
        cand = right[(right["k"] == lrow["k"]) &
                     (rus <= lus[lrow["rid"]])]
        if len(cand) == 0:
            assert pd.isna(got.loc[lrow["rid"], "qid_r"])
            continue
        best_ts = (cand["ts"].astype("int64")).max()
        want = cand[cand["ts"].astype("int64") == best_ts]["qid"].max()
        assert int(got.loc[lrow["rid"], "qid_r"]) == int(want)


def test_asof_single_shuffle_plan(spark):
    left = _mk_events(7, 50, 3)
    right = _mk_events(8, 50, 3).rename(columns={"rid": "qid"})
    df = asof_join(_spark_df(spark, left), _spark_df(spark, right),
                   on=["k"], right_cols=["qid"], tiebreak="qid")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_interval_join_brute_force(spark):
    rng = np.random.RandomState(9)
    pts = _mk_events(10, 300, 4)
    s = rng.randint(0, 9_000, size=60) * 1_000_000
    iv = pd.DataFrame({
        "k": rng.randint(0, 4, size=60),
        "start": pd.to_datetime(s, unit="us"),
        "end": pd.to_datetime(s + rng.randint(1, 3_000, size=60)
                              * 1_000_000, unit="us"),
        "iid": np.arange(60),
    })
    for incl in (False, True):
        got = interval_join(
            _spark_df(spark, pts),
            _spark_df(spark, iv), on=["k"], end_inclusive=incl,
            bucket_width_us=600 * 1_000_000,
        ).select("rid", "iid").toPandas()
        pairs = set(map(tuple, got.values.tolist()))
        exp = set()
        for _, p in pts.iterrows():
            for _, i in iv.iterrows():
                if p["k"] != i["k"] or p["ts"] < i["start"]:
                    continue
                if (p["ts"] <= i["end"]) if incl else (p["ts"] < i["end"]):
                    exp.add((p["rid"], i["iid"]))
        assert pairs == exp
        assert len(got) == len(pairs)  # no duplicate pairs by construction


def test_interval_join_no_cartesian_broadcast(spark):
    pts = _mk_events(11, 50, 2)
    iv = pd.DataFrame({"k": [0, 1], "start": pts["ts"].iloc[:2],
                       "end": pts["ts"].iloc[:2] + pd.Timedelta("1h"),
                       "iid": [0, 1]})
    df = interval_join(_spark_df(spark, pts), _spark_df(spark, iv),
                       on=["k"], broadcast_intervals=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
