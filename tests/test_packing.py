"""Sequence packing: the two-phase distributed prefix-sum scan."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fatespark import packing


def _brute(ids, ntoks, budget):
    order = np.argsort(ids)
    start = {}
    run = 0
    for i in order:
        start[ids[i]] = run
        run += ntoks[i]
    out = {}
    for i, n in zip(ids, ntoks):
        s = start[i]
        last = max(s + n - 1, s)
        out[i] = (n, s, s // budget, last // budget,
                  last // budget - s // budget + 1)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(7)
    ids = rng.permutation(200).tolist()          # ids arrive unsorted
    ntoks = rng.integers(0, 90, size=200).tolist()  # includes empty docs
    pdf = pd.DataFrame({"doc_id": ids, "n": ntoks})
    return spark.createDataFrame(pdf), ids, ntoks


class TestPackSequences:
    def test_matches_brute_scan(self, docs):
        df, ids, ntoks = docs
        want = _brute(np.array(ids), np.array(ntoks), 128)
        got = packing.pack_sequences(df, budget=128, tokens_col="n",
                                     num_partitions=7).collect()
        assert len(got) == 200
        for r in got:
            assert (r["n_tokens"], r["start_off"], r["seq_id"],
                    r["end_seq"], r["n_seqs"]) == want[r["id"]]
        # non-vacuous: some docs straddle a sequence boundary
        assert any(r["n_seqs"] > 1 for r in got)

    def test_partition_boundary_invariance(self, docs):
        df, _, _ = docs
        a = sorted(map(tuple, packing.pack_sequences(
            df, budget=128, tokens_col="n", num_partitions=1).collect()))
        b = sorted(map(tuple, packing.pack_sequences(
            df, budget=128, tokens_col="n", num_partitions=13).collect()))
        assert a == b

    def test_text_tokens_default(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c"), (1, ""), (2, None), (3, "x  y")],
            "doc_id long, text string")
        got = {r["id"]: (r["n_tokens"], r["start_off"]) for r in
               packing.pack_sequences(df, budget=4).collect()}
        assert got == {0: (3, 0), 1: (0, 3), 2: (0, 3), 3: (2, 3)}

    def test_no_global_window(self, docs):
        """The scan must NOT be a single-partition window: no
        Exchange SinglePartition, no Window operator in the plan."""
        df, _, _ = docs
        out = packing.pack_sequences(df, budget=128, tokens_col="n",
                                     num_partitions=7)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan
        assert "Window" not in plan

    def test_budget_validation(self, docs):
        df, _, _ = docs
        with pytest.raises(ValueError):
            packing.pack_sequences(df, budget=0, tokens_col="n")
