"""Min-span proximity boost: span kernel vs a brute position re-scan,
the c=0 bit-identity with plain AND, non-vacuous re-ranking, adjacency
earning the maximal boost, and tombstone hygiene."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_df
from fatespark.query import SearchIndex


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pb") / "idx")
    corpus = pages_df(spark, 900, partitions=4).select(
        F.xxhash64("url").alias("doc_id"), "url", "text").localCheckpoint()
    IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1)).build(
        spark, corpus, id_col="doc_id", build_id="pb")
    return SearchIndex(spark, d), corpus


def _brute_minspan(text, terms):
    toks = (text or "").lower().split()
    pos = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
    if any(not v for v in pos.values()):
        return None
    best = None
    for p in sorted(x for v in pos.values() for x in v):
        nxt = []
        for t in terms:
            c = [x for x in pos[t] if x >= p]
            if not c:
                nxt = None
                break
            nxt.append(c[0])
        if nxt is None:
            continue
        span = max(nxt) - p
        best = span if best is None else min(best, span)
    return best


def test_scores_match_brute(fixture):
    idx, corpus = fixture
    terms = ["smith", "the"]
    got = {r["doc_id"]: r["score"] for r in
           idx.search_proximity_boost(terms, k=1000, c=1.0).collect()}
    plain = {r["doc_id"]: r["score"] for r in
             idx.search(terms, k=100000, mode="AND").collect()}
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    assert got
    for d, s in got.items():
        span = _brute_minspan(texts[d], terms)
        boost = 1.0 + 1.0 / (1.0 + (float(span) - 1.0))
        assert s == plain[d] * boost, d


def test_c_zero_is_plain_and(fixture):
    idx, _ = fixture
    a = [(r["doc_id"], r["score"]) for r in
         idx.search(["smith", "the"], k=10, mode="AND",
                    quantize=4).collect()]
    b = [(r["doc_id"], r["score"]) for r in
         idx.search_proximity_boost(["smith", "the"], k=10, c=0.0,
                                    quantize=4).collect()]
    assert a == b


def test_reranks_nonvacuously(fixture):
    idx, _ = fixture
    a = [r["doc_id"] for r in
         idx.search(["smith", "the"], k=10, mode="AND").collect()]
    b = [r["doc_id"] for r in
         idx.search_proximity_boost(["smith", "the"], k=10,
                                    c=1.0).collect()]
    assert a != b


def test_adjacent_terms_get_max_boost(fixture, spark, tmp_path):
    d = str(tmp_path / "adj")
    rows = [(1, "alpha beta filler filler"),
            (2, "alpha filler filler beta")]
    import pandas as pd
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"])),
        id_col="doc_id", url_col="doc_id", build_id="adj")
    idx2 = SearchIndex(spark, d)
    got = {r["doc_id"]: r["score"] for r in
           idx2.search_proximity_boost(["alpha", "beta"], k=2,
                                       c=1.0).collect()}
    plain = {r["doc_id"]: r["score"] for r in
             idx2.search(["alpha", "beta"], k=2, mode="AND").collect()}
    assert got[1] == plain[1] * 2.0          # span 1 -> full 1+c
    assert got[2] == plain[2] * (1.0 + 1.0 / 3.0)


def test_tombstones_drop(fixture):
    idx, _ = fixture
    top = idx.search_proximity_boost(["smith", "the"], k=3,
                                     c=1.0).collect()
    victims = [int(r["doc_id"]) for r in top]
    idx.tombstones = np.sort(np.asarray(victims, dtype=np.int64))
    try:
        got = [r["doc_id"] for r in
               idx.search_proximity_boost(["smith", "the"], k=10,
                                          c=1.0).collect()]
        assert not set(got) & set(victims)
    finally:
        idx.tombstones = None


def test_validation(fixture):
    idx, _ = fixture
    with pytest.raises(ValueError):
        idx.search_proximity_boost(["batch"], c=-1.0)
    assert idx.search_proximity_boost(["zzznope"], k=5).count() == 0
