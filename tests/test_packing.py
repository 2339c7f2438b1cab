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


class TestMixtureSample:
    """Source-weighted mixing: integer-exact contract vs a pure-Python
    re-derivation, plus edge rules (unknown source, empty source)."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rng = np.random.default_rng(3)
        rows = []
        for i in range(300):
            src = f"s{i % 4}"
            rows.append((i, src, int(rng.integers(1, 50))))
        rows.append((300, "empty", 0))     # zero-token source
        rows.append((301, "ghost", 17))    # source missing from weights
        pdf = pd.DataFrame(rows, columns=["doc_id", "source", "n"])
        return spark.createDataFrame(pdf), rows

    @staticmethod
    def _brute(rows, weights, budget, seed="mix"):
        import hashlib
        tot = {}
        for _, s, n in rows:
            tot[s] = tot.get(s, 0) + n
        wsum = sum(weights.values())
        par = {}
        for s, toks in tot.items():
            target = weights.get(s, 0) * budget // wsum
            if toks <= 0 or target <= 0:
                par[s] = (0, 0)
            else:
                par[s] = (target // toks,
                          (target % toks) * 1_000_000 // toks)
        out = {}
        for i, s, n in rows:
            h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15],
                    16) % 1_000_000
            e, cut = par[s]
            out[i] = e + (1 if h < cut else 0)
        return out

    def test_matches_brute(self, corpus):
        from fatespark import sampling
        df, rows = corpus
        weights = {"s0": 3, "s1": 1, "s2": 2, "s3": 1, "empty": 5}
        want = self._brute(rows, weights, 25_000)
        got = {r["id"]: r["n_copies"] for r in sampling.mixture_sample(
            df, weights, token_budget=25_000, tokens_col="n").collect()}
        assert got == want
        assert got[300] == 0            # zero-token source
        assert got[301] == 0            # unweighted source
        assert max(got.values()) >= 2   # some source upsampled
        assert min(got[i] for i, s, _ in rows if s == "s1") >= 0

    def test_token_budget_hit_per_source(self, corpus):
        from fatespark import sampling
        df, rows = corpus
        weights = {"s0": 1, "s1": 1, "s2": 1, "s3": 1}
        res = sampling.mixture_sample(df, weights, token_budget=20_000,
                                      tokens_col="n").collect()
        wsum = sum(weights.values())
        per = {}
        for r in res:
            per.setdefault(r["source"], 0)
            per[r["source"]] += r["n_copies"] * r["n_tokens"]
        for s, w in weights.items():
            target = w * 20_000 // wsum
            # fractional-epoch rounding is per-doc, so the realized total
            # sits within a few max-doc sizes of the target
            assert abs(per[s] - target) <= 250, (s, per[s], target)

    def test_validation(self, corpus):
        from fatespark import sampling
        df, _ = corpus
        with pytest.raises(ValueError):
            sampling.mixture_sample(df, {"s0": 0.5}, 100, tokens_col="n")
        with pytest.raises(ValueError):
            sampling.mixture_sample(df, {}, 100, tokens_col="n")
