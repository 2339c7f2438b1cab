"""Distributed BPE training vs a pure-Python reference implementation."""

import pytest

from fatespark import bpetrain


def _ref_bpe(word_counts, n_merges):
    """Sennrich-style reference with the engine's deterministic tie rule
    (count desc, then (left, right) lexicographic)."""
    seqs = [(list(w), c) for w, c in sorted(word_counts.items())]
    merges = []
    for rank in range(n_merges):
        stats = {}
        for syms, c in seqs:
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] = \
                    stats.get((syms[i], syms[i + 1]), 0) + c
        if not stats:
            break
        (a, b), freq = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, freq))
        out = []
        for syms, c in seqs:
            new, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            out.append((new, c))
        seqs = out
    return merges


class TestBpeTrain:
    def test_matches_reference(self, spark):
        docs = ["the cat sat on the mat",
                "the thin cat ate the fat rat",
                "that cat and that rat sat"]
        df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                                   "doc_id long, text string")
        counts = {}
        for t in docs:
            for w in t.split():
                counts[w] = counts.get(w, 0) + 1
        want = _ref_bpe(counts, 6)
        got = bpetrain.bpe_train(df, n_merges=6)
        assert got == want
        assert len(got) == 6 and got[0][1:3] == ("t", "h") or got == want

    def test_overlapping_pair_count_and_chained_merge(self, spark):
        # "aaaa" x3: round 1 counts (a,a) 9 times (overlapping convention)
        # and merges to [aa, aa]; round 2 merges (aa, aa)
        df = spark.createDataFrame([(0, "aaaa aaaa aaaa")],
                                   "doc_id long, text string")
        got = bpetrain.bpe_train(df, n_merges=2)
        assert got == [(0, "a", "a", 9), (1, "aa", "aa", 3)]

    def test_early_stop(self, spark):
        df = spark.createDataFrame([(0, "a b c")],
                                   "doc_id long, text string")
        assert bpetrain.bpe_train(df, n_merges=5) == []

    def test_case_folding(self, spark):
        df = spark.createDataFrame([(0, "AB ab Ab aB")],
                                   "doc_id long, text string")
        got = bpetrain.bpe_train(df, n_merges=1)
        assert got == [(0, "a", "b", 4)]


def _ref_encode_word(word, merges):
    syms = list(word)
    for a, b in merges:
        new, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                new.append(a + b)
                i += 2
            else:
                new.append(syms[i])
                i += 1
        syms = new
    return len(syms)


class TestBpeEncode:
    DOCS = ["the cat sat on the mat",
            "the thin cat ate the fat rat",
            "that cat and that rat sat"]

    def _df(self, spark):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.DOCS)],
            "doc_id long, text string")

    def test_matches_reference_end_to_end(self, spark):
        df = self._df(spark)
        merges = [(a, b) for _, a, b, _ in bpetrain.bpe_train(
            df, n_merges=6)]
        got = {r["doc_id"]: (r["n_words"], r["n_tokens"])
               for r in bpetrain.bpe_encode(df, merges).collect()}
        want = {}
        for i, t in enumerate(self.DOCS):
            ws = t.split()
            want[i] = (len(ws), sum(_ref_encode_word(w, merges)
                                    for w in ws))
        assert got == want

    def test_chained_merges_single_token(self, spark):
        df = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
        got = bpetrain.bpe_encode(
            df, [("a", "a"), ("aa", "aa")]).collect()[0]
        assert (got["n_words"], got["n_tokens"]) == (1, 1)

    def test_shuffle_vocab_path_equal(self, spark):
        df = self._df(spark)
        merges = [(a, b) for _, a, b, _ in bpetrain.bpe_train(
            df, n_merges=4)]
        a = sorted(map(tuple, bpetrain.bpe_encode(
            df, merges, broadcast_vocab=True).collect()))
        b = sorted(map(tuple, bpetrain.bpe_encode(
            df, merges, broadcast_vocab=False).collect()))
        assert a == b
        plan = bpetrain.bpe_encode(df, merges)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_empty_doc_absent(self, spark):
        df = spark.createDataFrame([(0, "cat"), (1, "   "), (2, None)],
                                   "doc_id long, text string")
        got = bpetrain.bpe_encode(df, [("c", "a")]).collect()
        assert {r["doc_id"] for r in got} == {0}
