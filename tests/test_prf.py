"""Bo1 pseudo-relevance feedback: weight formula vs a pure-Python brute
recomputation, deterministic tie selection, the beta=0 degeneration law,
empty-feedback fallback, and non-vacuous expansion."""

import math
from collections import Counter

import pytest

from fatespark.analysis import analyze
from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_df
from fatespark.prf import bo1_expand, bo1_weights, prf_search
from fatespark.query import SearchIndex


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    from pyspark.sql import functions as F
    d = str(tmp_path_factory.mktemp("prf") / "idx")
    corpus = pages_df(spark, 1200, partitions=4).select(
        F.xxhash64("url").alias("doc_id"), "url", "text").localCheckpoint()
    IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1)).build(
        spark, corpus, id_col="doc_id", build_id="prf")
    return SearchIndex(spark, d), corpus


def _brute_weights(idx, corpus, query, fb_docs=10):
    ids = [r["doc_id"] for r in
           idx.search(query, k=fb_docs, mode="OR").collect()]
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    tfx = Counter()
    for i in ids:
        tfx.update(analyze(texts[i] or "", idx.analyzer))
    stats = idx.term_stats(sorted(tfx))
    out = {}
    for t, by_field in stats.items():
        lam = sum(v["cf"] for v in by_field.values()) / idx.n_docs
        out[t] = (float(tfx[t]) * math.log((1.0 + lam) / lam)
                  + math.log(1.0 + lam))
    return out


def test_weights_match_bruteforce(fixture):
    idx, corpus = fixture
    got = bo1_weights(idx, corpus, ["smith", "jones"], fb_docs=10)
    expect = _brute_weights(idx, corpus, ["smith", "jones"])
    assert got == expect       # bit-equal floats, same key set
    assert len(got) > 20       # feedback docs carry a real vocabulary


def test_expansion_contract(fixture):
    idx, corpus = fixture
    terms, boosts = bo1_expand(idx, corpus, ["smith", "jones"],
                               fb_docs=10, fb_terms=8, beta=0.4)
    w = bo1_weights(idx, corpus, ["smith", "jones"], fb_docs=10)
    sel = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    wmax = max(v for _, v in sel)
    assert set(terms) == {"smith", "jones"} | {t for t, _ in sel}
    for t, v in sel:
        base = 1.0 if t in ("smith", "jones") else 0.0
        assert boosts[t] == base + 0.4 * (v / wmax)
    # originals always queryable at >= 1.0
    assert boosts["smith"] >= 1.0 and boosts["jones"] >= 1.0
    # non-vacuous: at least one genuinely new term entered the query
    assert any(t not in ("smith", "jones") for t, _ in sel)


def test_beta_zero_degenerates_to_plain_search(fixture):
    """beta=0 boosts expansion terms to 0.0 — their contributions vanish
    exactly (x + 0.0 == x for positive scores), so ranks AND scores are
    bit-identical to the unexpanded query."""
    idx, corpus = fixture
    plain = [(r["doc_id"], r["score"]) for r in
             idx.search(["smith", "jones"], k=10, mode="OR").collect()]
    prf = [(r["doc_id"], r["score"]) for r in
           prf_search(idx, corpus, ["smith", "jones"], k=10,
                      fb_docs=10, fb_terms=8, beta=0.0).collect()]
    assert prf == plain


def test_expansion_changes_ranking(fixture):
    idx, corpus = fixture
    plain = [r["doc_id"] for r in
             idx.search(["smith", "jones"], k=10, mode="OR").collect()]
    prf = [r["doc_id"] for r in
           prf_search(idx, corpus, ["smith", "jones"], k=10,
                      fb_docs=10, fb_terms=8, beta=0.4).collect()]
    assert prf != plain


def test_empty_feedback_falls_back(fixture):
    idx, corpus = fixture
    assert bo1_weights(idx, corpus, ["zzznotaterm"]) == {}
    terms, boosts = bo1_expand(idx, corpus, ["zzznotaterm"])
    assert terms == ["zzznotaterm"] and boosts == {}
    assert prf_search(idx, corpus, ["zzznotaterm"], k=10).count() == 0
