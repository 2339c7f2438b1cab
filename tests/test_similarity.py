"""Pluggable similarity (Lucene Similarity contract): BM25 (default),
ClassicSimilarity TF-IDF, and LM Dirichlet — a pure query-time switch over
the same index bytes (tf/dl/df/cf serve every model).

Parity oracle: a brute-force pandas scorer recomputes each model from the
raw corpus (tokenization independent of the engine's index path); both
readers and the WAND kernel must match it exactly in ranking and to
float64 on scores."""

import math

import numpy as np
import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.local import LocalSearchIndex
from fatespark.query import SearchIndex

DOCS = [
    (1, "apple banana cherry apple"),
    (2, "apple apple apple banana banana date elder fig"),
    (3, "banana cherry cherry date grape grape grape"),
    (4, "apple"),
    (5, "cherry date elder fig grape apple banana cherry date elder "
        "fig grape apple banana"),
    (6, "banana banana banana banana banana banana"),
    (7, "apple banana"),
    (8, "date elder"),
    (9, "apple cherry apple cherry apple cherry apple cherry"),
    (10, "fig"),
]


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    d = str(tmp_root / "sim_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="sim")
    return SearchIndex(spark, d), LocalSearchIndex(d)


def _brute(terms, similarity, mu=2000.0, delta=1.0, jm_lambda=0.7):
    toks = {i: t.split() for i, t in DOCS}
    n = len(DOCS)
    sum_dl = float(sum(len(v) for v in toks.values()))
    out = {}
    for i, tk in toks.items():
        dl = len(tk)
        s = 0.0
        for term in sorted(set(terms)):
            tf = tk.count(term)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if term in v)
            cf = sum(v.count(term) for v in toks.values())
            if similarity == "classic":
                c = 1.0 + math.log(n / (df + 1.0))
                s += (c * c) * (math.sqrt(tf) / math.sqrt(dl))
            elif similarity == "lmd":
                pw = cf / sum_dl
                # np.log, matching the kernel's vectorized op bit-for-bit
                raw = (float(np.log(1.0 + tf / (mu * pw)))
                       + float(np.log(mu / (dl + mu))))
                s += max(raw, 0.0)
            elif similarity == "lmjm":
                pw = cf / sum_dl
                s += float(np.log(1.0 + ((1.0 - jm_lambda) * (tf / dl))
                                  / (jm_lambda * pw)))
            elif similarity == "bm25plus":
                # BM25+ (Lv & Zhai 2011): bm25 part lower-bounded by delta
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                norm = 0.25 + 0.75 * dl / (sum_dl / n)
                s += idf * (tf * 2.2 / (tf + 1.2 * norm) + delta)
            else:
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                norm = 0.25 + 0.75 * dl / (sum_dl / n)
                s += idf * tf * 2.2 / (tf + 1.2 * norm)
        if any(x in tk for x in terms):  # matched docs stay, even at
            out[i] = s                     # clamped score 0 (Lucene too)
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.mark.parametrize("similarity", ["classic", "lmd", "lmjm", "bm25plus"])
@pytest.mark.parametrize("mode", ["OR", "AND"])
def test_matches_brute_force(built, similarity, mode):
    idx, loc = built
    terms = ["apple", "banana"]
    got = [(r["doc_id"], r["score"]) for r in
           idx.search(terms, k=10, mode=mode,
                      similarity=similarity).collect()]
    want = _brute(terms, similarity)
    if mode == "AND":
        both = {i for i, tk in ((i, t.split()) for i, t in DOCS)
                if all(x in tk for x in terms)}
        want = [(i, s) for i, s in want if i in both]
    want = want[:10]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=0, abs=0), (similarity, gd)


@pytest.mark.parametrize("similarity", ["classic", "lmd", "lmjm", "bm25plus"])
def test_local_parity_and_wand(built, similarity):
    idx, loc = built
    terms = ["apple", "cherry", "grape"]
    dist = [(r["doc_id"], r["score"]) for r in
            idx.search(terms, k=10, similarity=similarity).collect()]
    wand = [(r["doc_id"], r["score"]) for r in
            idx.search(terms, k=10, similarity=similarity,
                       use_wand=True).collect()]
    lcl = [(int(r.doc_id), float(r.score)) for r in
           loc.search(terms, k=10, similarity=similarity).itertuples()]
    assert dist == wand == lcl


def test_lmd_clamp_nonnegative(built):
    idx, _ = built
    rows = idx.search(["apple", "banana", "grape", "fig"], k=10,
                      similarity="lmd").collect()
    assert rows and all(r["score"] >= 0.0 for r in rows)


def test_default_bm25_unchanged(built):
    idx, _ = built
    a = [(r["doc_id"], r["score"]) for r in
         idx.search(["apple", "banana"], k=10).collect()]
    b = [(r["doc_id"], r["score"]) for r in
         idx.search(["apple", "banana"], k=10,
                    similarity="bm25").collect()]
    assert a == b


def test_models_rank_differently_here(built):
    """Sanity that the switch is non-vacuous on this corpus."""
    idx, _ = built
    orders = {}
    for sim in ("bm25", "classic", "lmd"):
        orders[sim] = [r["doc_id"] for r in
                       idx.search(["apple", "banana"], k=10,
                                  similarity=sim).collect()]
    assert len({tuple(v) for v in orders.values()}) >= 2


def test_bad_similarity_raises(built):
    idx, loc = built
    with pytest.raises(ValueError):
        idx.search(["apple"], similarity="dfr")
    with pytest.raises(ValueError):
        loc.search(["apple"], similarity="dfr")
    with pytest.raises(ValueError):
        idx.search(["apple"], similarity="classic", filter_terms=["x"],
                   rebase_stats=True)
