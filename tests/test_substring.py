"""Exact-substring dedup (rolling token windows) + benchmark decontamination.

Brute-force python twins over small corpora with planted boilerplate, edge
cases (short docs, empty text, exact-dup docs), and plan-shape assertions
(window generation is narrow; decontamination broadcasts the benchmark side
and never shuffles the corpus)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from fatespark.dedup import (decontaminate_flags, substring_dup_doc_stats,
                             substring_dup_windows, substring_window_hashes)

BOILER = "all rights reserved contact us for terms of service and privacy"


def _fold(s: str) -> str:
    return "".join(c.lower() if "A" <= c <= "Z" else c for c in s)


def _toks(s: str) -> list[str]:
    return [_fold(t) for t in s.split()]


def _windows(s: str, w: int, stride: int = 1) -> list[tuple[int, str]]:
    t = _toks(s)
    return [(i, hashlib.md5(" ".join(t[i:i + w]).encode()).hexdigest())
            for i in range(0, len(t) - w + 1, stride)]


DOCS = [
    (0, f"alpha beta gamma {BOILER} delta epsilon"),
    (1, f"zeta eta theta iota {BOILER}"),
    (2, "kappa llambda mu nu xi omicron pi rho sigma tau upsilon phi"),
    (3, f"alpha beta gamma {BOILER} delta epsilon"),        # exact dup of 0
    (4, "short doc"),                                       # < w tokens
    (5, None),                                              # null text
    (6, "UPPER Case TOKENS upper case tokens"),             # fold matters
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestWindowHashes:
    def test_brute_force_parity(self, spark, docs):
        got = {(r.id, r.win_start, r.whash)
               for r in substring_window_hashes(docs, w=4).collect()}
        want = {(i, s, h) for i, txt in DOCS
                for s, h in _windows(txt or "", 4)}
        assert got == want

    def test_stride(self, spark, docs):
        got = {(r.id, r.win_start)
               for r in substring_window_hashes(docs, w=4, stride=3).collect()}
        want = {(i, s) for i, txt in DOCS
                for s, _ in _windows(txt or "", 4, stride=3)}
        assert got == want
        assert all(s % 3 == 0 for _, s in got)

    def test_short_and_null_docs_yield_no_windows(self, spark, docs):
        got = substring_window_hashes(docs, w=4).filter(
            F.col("id").isin([4, 5])).count()
        assert got == 0

    def test_narrow_plan(self, spark, docs):
        plan = substring_window_hashes(docs, w=4)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan  # window generation never shuffles


class TestDupWindows:
    def test_planted_boilerplate_found(self, spark, docs):
        rows = substring_dup_windows(docs, w=11).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.id, []).append(r)
        # the 11-token BOILER run is shared by docs 0, 1, 3
        boiler_hash = hashlib.md5(_fold(BOILER).encode()).hexdigest()
        for d, start in [(0, 3), (1, 4), (3, 3)]:
            hit = [r for r in by_doc.get(d, []) if r.whash == boiler_hash]
            assert len(hit) == 1 and hit[0].win_start == start
            assert hit[0].n_docs == 3
        # docs 0 and 3 are exact dups: EVERY window of doc 0 is duplicated
        n0 = len(_windows(DOCS[0][1], 11))
        assert len(by_doc[0]) == n0 and len(by_doc[3]) == n0
        assert 2 not in by_doc and 4 not in by_doc and 5 not in by_doc

    def test_brute_force_parity(self, spark, docs):
        w = 5
        got = {(r.id, r.win_start, r.n_docs)
               for r in substring_dup_windows(docs, w=w).collect()}
        all_w = [(i, s, h) for i, txt in DOCS
                 for s, h in _windows(txt or "", w)]
        docs_per_hash = {}
        for i, _, h in all_w:
            docs_per_hash.setdefault(h, set()).add(i)
        want = {(i, s, len(docs_per_hash[h])) for i, s, h in all_w
                if len(docs_per_hash[h]) >= 2}
        assert got == want


class TestDocStats:
    def test_stats(self, spark, docs):
        w = 11
        got = {r.id: (r.n_windows, r.dup_windows, r.dup_frac)
               for r in substring_dup_doc_stats(docs, w=w).collect()}
        assert set(got) == {i for i, _ in DOCS}  # every doc has a row
        all_w = [(i, h) for i, txt in DOCS for _, h in _windows(txt or "", w)]
        docs_per_hash = {}
        for i, h in all_w:
            docs_per_hash.setdefault(h, set()).add(i)
        for i, txt in DOCS:
            wins = _windows(txt or "", w)
            dup = sum(1 for _, h in wins if len(docs_per_hash[h]) >= 2)
            frac = round(dup / len(wins), 6) if wins else 0.0
            assert got[i] == (len(wins), dup, frac), i
        assert got[0][2] == 1.0 and got[3][2] == 1.0   # exact-dup pair
        assert got[2] == (2, 0, 0.0)
        assert got[4] == (0, 0, 0.0) and got[5] == (0, 0, 0.0)


class TestDecontaminate:
    def test_flags(self, spark, docs):
        bench = spark.createDataFrame(
            [(100, f"intro words {BOILER} outro words")],
            "doc_id long, text string")
        got = {r.id: (r.n_hits, r.contaminated)
               for r in decontaminate_flags(docs, bench, n=6).collect()}
        bench_hashes = {h for _, h in
                        _windows(f"intro words {BOILER} outro words", 6)}
        for i, txt in DOCS:
            hits = sum(1 for _, h in _windows(txt or "", 6)
                       if h in bench_hashes)
            assert got[i] == (hits, hits > 0), i
        assert got[0][1] and got[1][1] and got[3][1]
        assert not got[2][1] and not got[4][1] and not got[5][1]

    def test_benchmark_side_broadcasts(self, spark, docs):
        bench = spark.createDataFrame([(100, BOILER)],
                                      "doc_id long, text string")
        plan = decontaminate_flags(docs, bench, n=6)._jdf.queryExecution() \
            .executedPlan().toString()
        # the bench side must broadcast (never a sort-merge/shuffled join
        # against corpus-token-scale windows)
        assert "BroadcastHashJoin" in plan
        # corpus side stays narrow into the broadcast join: in the printed
        # tree the BHJ's streamed (corpus) child is the text between the
        # join node and its BroadcastExchange build side — no exchange there
        corpus_side = plan.split("BroadcastHashJoin")[1] \
                          .split("BroadcastExchange")[0]
        assert "Exchange" not in corpus_side


class TestSubstringCut:
    """Span surgery: duplicated windows are cut except the globally
    canonical occurrence; surviving tokens reassemble."""

    def _expected(self, rows, w):
        from collections import Counter
        docs = {i: _toks(t or "") for i, t in rows}
        wins = []
        for i in sorted(docs):
            t = docs[i]
            for s in range(0, max(len(t) - w + 1, 0)):
                wins.append((i, s, " ".join(t[s:s + w])))
        cnt = Counter(c for _, _, c in wins)
        first = {}
        for i, s, c in sorted(wins):
            first.setdefault(c, (i, s))
        exp = {}
        for i, _ in rows:
            t = docs[i]
            cover = [False] * len(t)
            for d, s, c in wins:
                if d == i and cnt[c] >= 2 and first[c] != (d, s):
                    for p in range(s, s + w):
                        cover[p] = True
            clean = " ".join(tk for p, tk in enumerate(t) if not cover[p])
            exp[i] = (len(t), sum(cover), len(clean),
                      hashlib.md5(clean.encode()).hexdigest())
        return exp

    def test_brute_force_parity(self, spark, docs):
        from fatespark.dedup import substring_cut_df
        got = {r.id: (r.n_tokens, r.n_cut, r.clean_len, r.clean_md5)
               for r in substring_cut_df(docs, w=4).collect()}
        assert got == self._expected(DOCS, 4)

    def test_exact_dup_doc_cleans_to_empty(self, spark, docs):
        """Doc 3 is an exact dup of doc 0: every window is duplicated and
        doc 0 holds every canonical occurrence, so doc 3 loses ALL
        covered tokens."""
        from fatespark.dedup import substring_cut_df
        out = {r.id: r for r in substring_cut_df(docs, w=4).collect()}
        assert out[3].n_cut == out[3].n_tokens
        assert out[3].clean_len == 0
        assert out[0].n_cut == 0              # canonical doc untouched

    def test_within_doc_repeats(self, spark):
        from fatespark.dedup import substring_cut_df
        df = spark.createDataFrame([(1, "m n m n m n m n")],
                                   "doc_id long, text string")
        r = substring_cut_df(df, w=3).collect()[0]
        # windows 'm n m'@0,2,4 and 'n m n'@1,3,5: canonical @0 and @1,
        # cuts cover [2, 8) -> keep 'm n'
        assert (r.n_tokens, r.n_cut, r.clean_len) == (8, 6, 3)

    def test_unique_corpus_is_identity(self, spark):
        from fatespark.dedup import substring_cut_df
        rows = [(1, "a b c d"), (2, "e f g h")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for r in substring_cut_df(df, w=3).collect():
            src = " ".join(_toks(dict(rows)[r.id]))
            assert r.n_cut == 0
            assert r.clean_md5 == hashlib.md5(src.encode()).hexdigest()

    def test_partition_invariance(self, spark, docs):
        from fatespark.dedup import substring_cut_df
        a = sorted(map(tuple, substring_cut_df(docs, w=4).collect()))
        b = sorted(map(tuple,
                       substring_cut_df(docs.repartition(5), w=4).collect()))
        assert a == b
