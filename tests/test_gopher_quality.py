"""Gopher Table A1 non-repetition quality filters — python-twin parity."""

import math
import re

from fatespark.textops import gopher_quality_df


def _q6(x):
    return math.floor(x * 1e6) / 1e6


def _expected(t):
    t = t or ""
    toks = [x for x in re.split(r"[ \t\n\r\f\x0b]+", t) if x]
    lines = [ln.strip() for ln in t.split("\n") if ln.strip()]
    nw, nl = len(toks), len(lines)
    alpha = sum(1 for x in toks if re.search(r"[A-Za-z]", x))
    n_hash = t.count("#")
    n_uell = t.count("…")
    n_dots = (len(t) - len(t.replace("...", ""))) / 3
    bullets = sum(1 for ln in lines if re.match(r"^[-*•]( |$)", ln))
    ell = sum(1 for ln in lines if re.search(r"(\.\.\.|…)$", ln))
    return (
        nw,
        _q6(sum(map(len, toks)) / nw) if nw else 0.0,
        _q6(alpha / nw) if nw else 0.0,
        _q6((n_hash + n_uell + n_dots) / nw) if nw else 0.0,
        _q6(bullets / nl) if nl else 0.0,
        _q6(ell / nl) if nl else 0.0,
    )


CASES = [
    (1, "normal words in a plain sentence here"),
    (2, "- bullet one\n* bullet two\n• bullet three\nplain line"),
    (3, "cliffhanger ending...\nanother one…\nplain"),
    (4, "### #tags # everywhere 123 456 789"),
    (5, ""),
    (6, None),
    (7, "....\n-dash-no-space\n- dash space\n*\n…"),
    (8, "mixed… stuff... here #x\n- b ...\nok"),
]


class TestGopherQuality:
    def test_parity(self, spark):
        df = spark.createDataFrame(CASES, "doc_id long, text string")
        got = {r.doc_id: (r.n_words, r.mean_word_len, r.alpha_word_frac,
                          r.symbol_word_ratio, r.bullet_line_frac,
                          r.ellipsis_line_frac)
               for r in gopher_quality_df(df).collect()}
        for i, t in CASES:
            assert got[i] == _expected(t), (i, t)

    def test_zero_shuffle(self, spark):
        df = spark.createDataFrame(CASES, "doc_id long, text string")
        plan = gopher_quality_df(df)._jdf.queryExecution().executedPlan() \
                                    .toString()
        assert "Exchange" not in plan
