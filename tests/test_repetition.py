"""Gopher-style repetition signals: brute-force python twin + edge cases.

The python twin recomputes each signal definitionally (dict counting); the
Spark side must match to 1e-9 after the documented 6-decimal rounding."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from fatespark.textops import repetition_df


def _fold(s: str) -> str:
    return "".join(c.lower() if "A" <= c <= "Z" else c for c in s)


def _q6(x: float) -> float:
    return math.floor(x * 1e6) / 1e6


def _brute(text: str | None) -> tuple[float, float, float, float]:
    t = _fold(text or "")
    # trim is SPACE-only (Spark/DuckDB trim default), not python .strip()
    lines = [ln.strip(" ") for ln in t.split("\n")]
    lines = [ln for ln in lines if ln]
    if lines:
        lc = Counter(lines)
        dup_line_frac = _q6(1.0 - len(lc) / len(lines))
        total_chars = sum(len(ln) for ln in lines)
        dup_chars = sum(len(ln) for ln in lines if lc[ln] > 1)
        dup_line_char_frac = _q6(dup_chars / total_chars)
    else:
        dup_line_frac = dup_line_char_frac = 0.0
    toks = t.split()
    g2 = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
    if g2:
        c2 = Counter(g2)
        cover = max(cnt * len(g) for g, cnt in c2.items())
        top2 = _q6(cover / sum(len(g) for g in g2))
    else:
        top2 = 0.0
    g5 = [" ".join(toks[i:i + 5]) for i in range(len(toks) - 4)]
    dup5 = _q6(1.0 - len(set(g5)) / len(g5)) if g5 else 0.0
    return dup_line_frac, dup_line_char_frac, top2, dup5


CASES = [
    "",
    None,
    "one single line of text",
    "dup line\ndup line\nunique line",
    "a\na\na\na",
    "  padded line  \npadded line\nother",          # trim before compare
    "UPPER line\nupper line",                        # fold before compare
    "the cat sat on the cat sat on the cat sat on",  # heavy 2/5-gram repeat
    "x y x y x y x y x y x y",
    "alpha beta gamma delta epsilon zeta eta theta",
    "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5 tail",            # dup 5-gram
    "line one\n\n\nline one\n   \nline two",         # empty lines dropped
    "short",
    "a b c d",                                       # < 5 tokens: no 5-grams
]


@pytest.fixture(scope="module")
def rep_df(spark):
    rows = [(i, t) for i, t in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return repetition_df(df, "text").drop("text")


class TestRepetition:
    def test_brute_force_parity(self, rep_df):
        got = {r.doc_id: (r.dup_line_frac, r.dup_line_char_frac,
                          r.top2gram_char_frac, r.dup5gram_frac)
               for r in rep_df.collect()}
        for i, t in enumerate(CASES):
            want = _brute(t)
            for a, b in zip(got[i], want):
                assert abs(a - b) < 1e-9, (i, t, got[i], want)

    def test_ranges(self, rep_df):
        for r in rep_df.collect():
            for v in (r.dup_line_frac, r.dup_line_char_frac,
                      r.top2gram_char_frac, r.dup5gram_frac):
                assert 0.0 <= v <= 1.0

    def test_known_values(self, rep_df):
        got = {r.doc_id: r for r in rep_df.collect()}
        # "a\na\na\na": 4 lines 1 distinct
        assert got[4].dup_line_frac == 0.75
        assert got[4].dup_line_char_frac == 1.0
        # all-distinct text: no repetition
        assert got[9].dup5gram_frac == 0.0 and got[9].dup_line_frac == 0.0
        # "w1..w5 w1..w5 tail": 7 5-grams, "w1 w2 w3 w4 w5" twice
        assert abs(got[10].dup5gram_frac - _q6(1 - 6 / 7)) < 1e-9

    def test_zero_shuffle_plan(self, rep_df):
        plan = rep_df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
