"""Proximity (SLOP) search: window semantics, brute-force parity, and
distributed/local reader parity.

Reference shape: fates exposes every hit offset through its suffix array
(``lib/suffix_array_reader.rb:45-72``), making "terms within N tokens" a
client-side walk; fatespark answers it index-side from position lists
(``query._near_match_docs``) with exact minimal-covering-window semantics.
"""

import itertools

import numpy as np
import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.local import LocalSearchIndex
from fatespark.query import SearchIndex

DOCS = [
    # doc_id, text — handcrafted windows around 'alpha'/'beta'/'gamma'
    (1, "alpha beta gamma"),                     # span 2, all adjacent
    (2, "alpha x beta y gamma"),                 # span 4
    (3, "gamma x x beta x x alpha"),             # span 6, reversed
    (4, "alpha beta"),                           # missing gamma
    (5, "alpha x x x x x x x x x beta x gamma"),  # alpha far, beta-gamma near
    (6, "beta alpha gamma beta"),                # span 2 via middle window
    (7, "x alpha x x gamma beta x alpha"),       # span 2: gamma beta ... alpha?
    (8, "gamma beta alpha"),                     # reversed adjacent, span 2
    (9, "alpha " + "pad " * 50 + "beta gamma alpha"),  # tail window span 2
    (10, "delta epsilon zeta"),                  # no query terms
]


def brute_near(text: str, terms: list[str], slop: int) -> bool:
    toks = [t.lower() for t in text.split() if t]
    pos = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
    if any(not v for v in pos.values()):
        return False
    for combo in itertools.product(*(pos[t] for t in terms)):
        if max(combo) - min(combo) <= slop:
            return True
    return False


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    d = str(tmp_root / "near_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="near")
    return SearchIndex(spark, d), LocalSearchIndex(d)


@pytest.mark.parametrize("terms,slop", [
    (["alpha", "beta", "gamma"], 2),
    (["alpha", "beta", "gamma"], 4),
    (["alpha", "beta", "gamma"], 6),
    (["alpha", "beta", "gamma"], 100),
    (["beta", "gamma"], 1),
    (["beta", "gamma"], 2),
    (["alpha", "gamma"], 3),
])
def test_matches_brute_force(built, terms, slop):
    idx, loc = built
    got = sorted(r["doc_id"] for r in
                 idx.search_near(terms, slop, k=100).collect())
    want = sorted(i for i, t in DOCS if brute_near(t, terms, slop))
    assert got == want, (terms, slop)


def test_local_parity(built):
    idx, loc = built
    for terms, slop in [(["alpha", "beta", "gamma"], 2),
                        (["beta", "gamma"], 1),
                        (["alpha", "gamma"], 50)]:
        dist = [(r["doc_id"], r["score"]) for r in
                idx.search_near(terms, slop, k=100).collect()]
        lpdf = loc.search_near(terms, slop, k=100)
        local = list(zip(lpdf["doc_id"].astype(int), lpdf["score"]))
        assert dist == local


def test_large_slop_equals_and(built):
    """With an unbounded window, proximity degenerates to conjunctive AND
    with identical BM25 scores (the restriction keeps every AND match)."""
    idx, _ = built
    near = [(r["doc_id"], r["score"]) for r in
            idx.search_near(["alpha", "beta"], 10_000, k=100).collect()]
    anded = [(r["doc_id"], r["score"]) for r in
             idx.search(["alpha", "beta"], k=100, mode="AND").collect()]
    assert near == anded


def test_phrase_is_subset_of_slop1(built):
    """Ordered adjacency ('beta gamma') implies an unordered window of
    span 1, never the reverse (doc 8 has 'gamma beta')."""
    idx, _ = built
    ph = {r["doc_id"] for r in idx.search_phrase("beta gamma",
                                                 k=100).collect()}
    near = {r["doc_id"] for r in
            idx.search_near(["beta", "gamma"], 1, k=100).collect()}
    assert ph <= near
    assert 8 in near - ph


def test_missing_term_empty(built):
    idx, loc = built
    assert idx.search_near(["alpha", "zzz_missing"], 5).count() == 0
    assert len(loc.search_near(["alpha", "zzz_missing"], 5)) == 0


def test_score_is_and_bm25_on_matches(built):
    """Scores come from the standard AND scorer — compare against
    idx.search on the full corpus restricted to window-matching docs."""
    idx, _ = built
    near = {r["doc_id"]: r["score"] for r in
            idx.search_near(["alpha", "beta", "gamma"], 2, k=100).collect()}
    full = {r["doc_id"]: r["score"] for r in
            idx.search(["alpha", "beta", "gamma"], k=100,
                       mode="AND").collect()}
    for d, s in near.items():
        assert s == full[d]


def test_kernel_randomized():
    """Property check of the shared kernel against brute force on random
    synthetic position data (no Spark)."""
    from fatespark.query import _near_match_docs
    rng = np.random.default_rng(7)
    terms = ["a", "b", "c"]
    for trial in range(25):
        n_docs = 30
        texts = {}
        for d in range(1, n_docs + 1):
            toks = rng.choice(["a", "b", "c", "x", "y"],
                              size=rng.integers(1, 40)).tolist()
            texts[d] = " ".join(toks)
        # build decoded-frame shape: docs sorted, positions per doc asc
        data = {}
        for t in terms:
            docs, tfs, poss, starts = [], [], [], []
            for d in sorted(texts):
                p = [i for i, x in enumerate(texts[d].split()) if x == t]
                if p:
                    docs.append(d)
                    tfs.append(len(p))
                    starts.append(len(poss))
                    poss.extend(p)
            if not docs:
                data = None
                break
            data[t] = {"docs": np.array(docs, dtype=np.int64),
                       "tfs": np.array(tfs, dtype=np.int64),
                       "tok_starts": np.array(starts, dtype=np.int64),
                       "poss": np.array(poss, dtype=np.int64)}
        if data is None:
            continue
        slop = int(rng.integers(0, 8))
        got = set(_near_match_docs(data, terms, slop, None).tolist())
        want = {d for d, t in texts.items() if brute_near(t, terms, slop)}
        assert got == want, (trial, slop)
