"""MMR diversification: a hand-computed greedy trace, the lam=1
pure-relevance law, near-duplicate demotion, missing-embedding novelty,
tie determinism, and end-to-end reader parity with the driver-side
greedy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fatespark.mmr import QUANT, mmr_rerank, mmr_select


def _v(*xs):
    return np.asarray(xs, dtype=np.int64)


def test_hand_computed_trace():
    """3-doc pool, lam=0.5, rrf_k=0 (rel = 1/rank): doc 1 (rank 1) first;
    doc 2 is doc 1's duplicate (sim 1), doc 3 orthogonal (sim 0):
    round 2 scores: doc2 = .5*(1/2) - .5*1 = -0.25, doc3 = .5*(1/3) - 0
    = 1/6 -> doc 3 wins despite worse relevance."""
    ranks = {1: 1, 2: 2, 3: 3}
    vecs = {1: _v(10, 0), 2: _v(10, 0), 3: _v(0, 10)}
    assert mmr_select(ranks, vecs, k=3, lam=0.5, rrf_k=0) == [1, 3, 2]


def test_lam_one_is_pure_relevance():
    ranks = {d: i + 1 for i, d in enumerate([7, 3, 9, 1])}
    vecs = {d: _v(1, 1) for d in ranks}   # everything identical
    assert mmr_select(ranks, vecs, k=4, lam=1.0) == [7, 3, 9, 1]


def test_missing_embedding_is_novel():
    """Docs without vectors are never penalized: with lam small, a
    vector-less doc outranks a duplicate."""
    ranks = {1: 1, 2: 2, 3: 3}
    vecs = {1: _v(5, 5), 2: _v(5, 5)}     # 3 has no embedding
    assert mmr_select(ranks, vecs, k=3, lam=0.3, rrf_k=0) == [1, 3, 2]


def test_tie_breaks_by_doc_id():
    ranks = {5: 1, 2: 1, 9: 1}            # artificial equal ranks
    vecs = {}
    assert mmr_select(ranks, vecs, k=3, lam=0.7) == [2, 5, 9]


def test_zero_vector_sim_zero():
    ranks = {1: 1, 2: 2}
    vecs = {1: _v(0, 0), 2: _v(0, 0)}
    assert mmr_select(ranks, vecs, k=2, lam=0.5) == [1, 2]


def test_validation():
    with pytest.raises(ValueError):
        mmr_select({1: 1}, {}, k=1, lam=1.5)


def test_reader_parity(spark, tmp_path_factory):
    """mmr_rerank == driving mmr_select by hand from the same pool."""
    from fatespark.build import BuildConfig, IndexBuilder
    from fatespark.corpus import pages_df
    from fatespark.query import SearchIndex
    d = str(tmp_path_factory.mktemp("mmr") / "idx")
    corpus = pages_df(spark, 800, partitions=4).select(
        F.xxhash64("url").alias("doc_id"), "url", "text")
    IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1)).build(
        spark, corpus, id_col="doc_id", build_id="mm")
    idx = SearchIndex(spark, d)
    # deterministic synthetic embeddings keyed by doc_id
    emb = corpus.select(F.col("doc_id").alias("vec_id")).withColumn(
        "embedding", F.array(*[
            (F.pmod(F.xxhash64(F.col("vec_id") + F.lit(i)), F.lit(1000))
             / 1000.0 - 0.5).cast("float") for i in range(8)]))
    got = mmr_rerank(idx, emb, ["smith", "jones"], k=5, pool=15,
                     lam=0.7, quantize=4).collect()
    res = idx.search(["smith", "jones"], k=15, mode="OR",
                     quantize=4).collect()
    ranks = {int(r["doc_id"]): i + 1 for i, r in enumerate(res)}
    vecs = {int(r["vec_id"]): np.floor(
        np.asarray(r["embedding"], dtype=np.float64) * QUANT
        ).astype(np.int64)
        for r in emb.filter(F.col("vec_id").isin(list(ranks))).collect()}
    expect = mmr_select(ranks, vecs, k=5, lam=0.7)
    assert [r["doc_id"] for r in got] == expect
    assert [r["mmr_rank"] for r in got] == [1, 2, 3, 4, 5]
    assert all(ranks[r["doc_id"]] == r["rel_rank"] for r in got)
    # the demotion is non-vacuous: MMR order differs from relevance order
    assert [r["doc_id"] for r in got] != [r["doc_id"] for r in res[:5]]
