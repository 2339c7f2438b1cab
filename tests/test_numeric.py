"""Numeric trie range filtering: covering-set exactness (fuzz), analyzer
protocol, and end-to-end filtered search parity."""

import random

import pytest
from pyspark.sql import functions as F

from fatespark.analysis import analyze
from fatespark.numeric import (BITS, STEP, numeric_trie_tokens, search_range,
                               split_range, trie_tokens)


def _interval(tok: str) -> tuple[int, int]:
    shift_s, _, pref_s = tok.partition("x")
    shift, prefix = int(shift_s, 10), int(pref_s, 16)
    return prefix << shift, ((prefix + 1) << shift) - 1


class TestSplitRange:
    def test_covering_set_is_exact_partition_fuzz(self):
        rng = random.Random(42)
        for _ in range(300):
            lo = rng.randrange(0, 1 << 20)
            hi = lo + rng.randrange(0, 1 << rng.randrange(1, 20))
            toks = split_range(lo, hi)
            ivals = sorted(_interval(t) for t in toks)
            # disjoint, contiguous, and exactly [lo, hi]
            assert ivals[0][0] == lo and ivals[-1][1] == hi, (lo, hi)
            for (a0, a1), (b0, b1) in zip(ivals, ivals[1:]):
                assert a1 + 1 == b0, (lo, hi)

    def test_every_value_matches_exactly_one_token(self):
        rng = random.Random(7)
        for _ in range(50):
            lo = rng.randrange(0, 1 << 16)
            hi = lo + rng.randrange(0, 1 << 12)
            cover = set(split_range(lo, hi))
            for v in {lo, hi, (lo + hi) // 2,
                      max(0, lo - 1), hi + 1, hi + 1000}:
                n = len(cover & set(trie_tokens(v)))
                assert n == (1 if lo <= v <= hi else 0), (lo, hi, v)

    def test_degenerate_and_clamped(self):
        assert split_range(5, 5) == [f"00x5"]
        assert split_range(7, 3) == []
        # clamps: negative lo, oversized hi
        toks = split_range(-10, (1 << BITS) + 5)
        ivals = sorted(_interval(t) for t in toks)
        assert ivals[0][0] == 0 and ivals[-1][1] == (1 << BITS) - 1

    def test_bounded_size(self):
        rng = random.Random(3)
        for _ in range(100):
            lo = rng.randrange(0, 1 << 30)
            hi = lo + rng.randrange(0, 1 << 30)
            n = len(split_range(lo, hi))
            assert n <= 2 * (1 << STEP) * (BITS // STEP), (lo, hi, n)


class TestAnalyzer:
    def test_tokens_per_level(self):
        assert trie_tokens(306) == [f"{s:02d}x{306 >> s:x}"
                                    for s in range(0, BITS, STEP)]
        assert numeric_trie_tokens("306") == trie_tokens(306)

    def test_garbage_and_multi(self):
        assert numeric_trie_tokens("notanum") == []
        assert numeric_trie_tokens("12 foo 99") == (trie_tokens(12)
                                                    + trie_tokens(99))
        assert numeric_trie_tokens("-5") == []

    def test_registered_analyzer_folds_cleanly(self):
        # analyze() folds tokens after tokenize; hex tokens are fold-stable
        assert analyze("306", analyzer="numeric_trie") == trie_tokens(306)


@pytest.fixture(scope="module")
def nidx(spark, tmp_root):
    from fatespark.build import BuildConfig, IndexBuilder
    from fatespark.corpus import pages_df
    from fatespark.query import SearchIndex
    d = str(tmp_root / "numeric_idx")
    corpus = (pages_df(spark, 600, partitions=4)
              .withColumn("doc_id", F.xxhash64("url"))
              .withColumn("nval", F.pmod(F.col("doc_id"), F.lit(1000))
                          .cast("string")))
    IndexBuilder(d, BuildConfig(
        n_buckets=4, salt_bits=0,
        analyzers=["whitespace", "numeric_trie"])).build(
        spark, corpus, id_col="doc_id",
        text_cols=["text", "nval"], build_id="nr")
    vals = {int(r["doc_id"]): int(r["nval"]) for r in
            corpus.select("doc_id", "nval").collect()}
    return SearchIndex(spark, d), vals


class TestRangeSearch:
    def test_filtered_equals_post_filter_of_full_ranking(self, nidx):
        idx, vals = nidx
        lo, hi = 200, 700
        got = [(r["doc_id"], r["score"]) for r in
               search_range(idx, ["the", "smith"], lo, hi,
                            numeric_field=1, k=10, mode="OR").collect()]
        # filter does not rebase stats: scores equal the unfiltered ranking
        full = [(r["doc_id"], r["score"]) for r in
                idx.search(["the", "smith"], k=600, mode="OR",
                           weights=[1.0, 0.0]).collect()]
        exp = [(d, s) for d, s in full if lo <= vals[d] <= hi][:10]
        assert got == exp and got

    def test_out_of_range_excluded(self, nidx):
        idx, vals = nidx
        got = search_range(idx, ["the"], 0, 99, numeric_field=1,
                           k=50, mode="OR").collect()
        assert got
        for r in got:
            assert vals[r["doc_id"]] <= 99

    def test_empty_range(self, nidx):
        idx, _ = nidx
        assert search_range(idx, ["the"], 5000, 6000,
                            numeric_field=1, k=10).count() == 0


class TestQueryLangRange:
    def test_parse(self):
        from fatespark.querylang import (QuerySyntaxError,
                                         UnsupportedQueryError, parse_query)
        p = parse_query("the nval:[300 TO 450] smith")
        assert p.terms == ["the", "smith"]
        assert p.range_filter == ("nval", 300, 450)
        import pytest as _pt
        with _pt.raises(QuerySyntaxError):
            parse_query("a nval:[300 450]")
        with _pt.raises(QuerySyntaxError):
            parse_query("a nval:[300 TO")
        with _pt.raises(QuerySyntaxError):
            parse_query("a nval:[x TO 450]")
        with _pt.raises(UnsupportedQueryError):
            parse_query("a n:[1 TO 2] m:[3 TO 4]")
        with _pt.raises(UnsupportedQueryError):
            parse_query("n:[1 TO 2]")  # filter-only

    def test_execute_routes_to_search_range(self, nidx):
        from fatespark.querylang import UnsupportedQueryError, execute
        idx, vals = nidx
        got = [(r["doc_id"], r["score"]) for r in
               execute(idx, "the smith nval:[200 TO 700]", k=10,
                       mode="OR", numeric_fields={"nval": 1}).collect()]
        want = [(r["doc_id"], r["score"]) for r in
                search_range(idx, ["smith", "the"], 200, 700,
                             numeric_field=1, k=10, mode="OR").collect()]
        assert got == want and got
        import pytest as _pt
        with _pt.raises(UnsupportedQueryError):
            execute(idx, "the nval:[1 TO 2]", numeric_fields={})
