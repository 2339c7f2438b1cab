"""Interpolated Kneser-Ney trigram surprisal: pure-python twin + KN
normalization invariants + partition invariance.

The python twin recomputes the full Chen-Goodman interpolated-KN model
definitionally (Counters over trigram types) with the SAME float expression
association as the engine; per-doc sums fold left-to-right in ascending
(a, b, c) order, so quantized values must match exactly."""

import math
import re
from collections import Counter, defaultdict

import pytest

from fatespark.knlm import kn3_surprisal_df

_WS = re.compile(r"[ \t\n\r\f\x0B]+")


def _tok(s):
    t = "".join(c.lower() if "A" <= c <= "Z" else c for c in (s or ""))
    return [w for w in _WS.split(t) if w]


def _kn_model(docs):
    """Returns (p, d3, d2, internals) — p maps trigram type -> probability
    with the module's exact expression association."""
    c3 = Counter()
    for _, text in docs:
        toks = _tok(text)
        for i in range(len(toks) - 2):
            c3[(toks[i], toks[i + 1], toks[i + 2])] += 1
    c2 = Counter()
    n1ab = Counter()
    ncbc = Counter()
    for (a, b, c), n in c3.items():
        c2[(a, b)] += n
        n1ab[(a, b)] += 1
    for (a, b, c) in c3:
        ncbc[(b, c)] += 1
    nbdot = Counter()
    n1b = Counter()
    ncc = Counter()
    for (b, c), n in ncbc.items():
        nbdot[b] += n
        n1b[b] += 1
        ncc[c] += 1
    t2 = float(len(ncbc))

    def disc(vals):
        n1 = sum(1 for v in vals if v == 1)
        n2 = sum(1 for v in vals if v == 2)
        return 0.5 if n1 + 2 * n2 == 0 else n1 / float(n1 + 2 * n2)

    d3 = disc(c3.values())
    d2 = disc(ncbc.values())
    p = {}
    for (a, b, c), n3c in c3.items():
        plow = ncc[c] / t2
        pmid = ((ncbc[(b, c)] - d2) / float(nbdot[b])
                + ((d2 * n1b[b]) / float(nbdot[b])) * plow)
        p[(a, b, c)] = ((n3c - d3) / float(c2[(a, b)])
                        + ((d3 * n1ab[(a, b)]) / float(c2[(a, b)])) * pmid)
    return p, d3, d2, (c3, c2, n1ab, ncbc, nbdot, n1b, ncc, t2)


def _kn_reference(docs, quantize=4):
    p, _, _, _ = _kn_model(docs)
    mul = 10.0 ** quantize
    out = {}
    for did, text in docs:
        toks = _tok(text)
        if len(toks) < 3:
            continue
        tf = Counter((toks[i], toks[i + 1], toks[i + 2])
                     for i in range(len(toks) - 2))
        acc = 0.0
        for g in sorted(tf):
            acc += tf[g] * -math.log(p[g])
        n3 = len(toks) - 2
        out[did] = (n3, math.floor(acc / n3 * mul) / mul)
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox sleeps"),
    (3, "pack my box with five dozen liquor jugs"),
    (4, "the lazy dog sleeps in the sun the lazy dog"),
    (5, "Quick Brown FOX the quick brown fox the quick"),
    (6, "one two"),          # < 3 tokens: excluded
    (7, "exactly three tokens"),
    (8, None),               # null text: excluded
    (9, "  padded   whitespace\tand\nnewlines split the   same way  "),
    (10, "repeat repeat repeat repeat repeat repeat"),
    (11, "zebra quantum flux zebra quantum flux zebra quantum"),
    (12, "with five dozen jugs the sun sleeps over my box"),
]


def test_kn_normalization_invariants():
    """Interpolated KN must be a proper distribution: for every context,
    seen-mass + backoff-mass == 1 (the backoff sum telescopes to 1
    analytically, so this checks the full bookkeeping)."""
    _, d3, d2, (c3, c2, n1ab, ncbc, nbdot, n1b, ncc, t2) = _kn_model(DOCS)
    assert 0.0 < d3 < 1.0 and 0.0 < d2 < 1.0
    # middle level: per b, sum over seen c of discounted mass + lambda = 1
    seen_mid = defaultdict(float)
    for (b, c), n in ncbc.items():
        seen_mid[b] += (n - d2) / float(nbdot[b])
    for b, s in seen_mid.items():
        assert abs(s + (d2 * n1b[b]) / float(nbdot[b]) - 1.0) < 1e-9
    # top level: per (a,b), discounted trigram mass + lambda = 1
    seen_top = defaultdict(float)
    for (a, b, c), n in c3.items():
        seen_top[(a, b)] += (n - d3) / float(c2[(a, b)])
    for ab, s in seen_top.items():
        assert abs(s + (d3 * n1ab[ab]) / float(c2[ab]) - 1.0) < 1e-9
    # lowest level sums to exactly 1 over the vocab
    assert abs(sum(ncc.values()) / t2 - 1.0) < 1e-12


def test_kn_surprisal_matches_python_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n3"], r["kn_surprisal"])
           for r in kn3_surprisal_df(df).collect()}
    want = _kn_reference(DOCS)
    assert got == want
    assert 6 not in got and 8 not in got          # short/null excluded
    assert got[7][0] == 1                          # exactly one trigram
    # doc 10 is one trigram repeated 4x: high-count, low surprisal
    assert got[10][1] < got[3][1]


def test_kn_partition_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, kn3_surprisal_df(df).collect()))
    b = sorted(map(tuple,
                   kn3_surprisal_df(df.repartition(7)).collect()))
    assert a == b


def test_kn_all_short_corpus_empty(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "")],
                               "doc_id long, text string")
    assert kn3_surprisal_df(df).count() == 0
