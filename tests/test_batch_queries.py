"""Batched multi-query search (SearchIndex.search_many): per-query results
must be rank- and score-identical to individual search() calls, from one
shared postings scan."""

import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_df
from fatespark.query import SearchIndex

N = 2000


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    d = str(tmp_root / "batch_idx")
    pages = pages_df(spark, N, partitions=4)
    IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1)).build(
        spark, pages, url_col="url", text_col="text", build_id="batch")
    return SearchIndex(spark, d)


QUERIES = {"a": ["the"], "b": ["merge", "scan"], "c": ["batch", "join"],
           "missing": ["zzz_notaterm"]}


@pytest.mark.parametrize("mode", ["OR", "AND"])
def test_matches_individual_search(built, mode):
    batch = built.search_many(QUERIES, k=10, mode=mode, quantize=4).collect()
    got = {}
    for r in batch:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    for qid in got:
        got[qid].sort()
    for qid, terms in QUERIES.items():
        single = built.search(terms, k=10, mode=mode, quantize=4).collect()
        want = [(i + 1, r["doc_id"], r["score"])
                for i, r in enumerate(single)]
        assert got.get(qid, []) == want, (qid, mode)


def test_empty_batch(built):
    assert built.search_many({}, k=5).count() == 0
    assert built.search_many({"x": ["zzz_notaterm"]}, k=5,
                             mode="AND").count() == 0


def test_rank_is_dense_from_one(built):
    rows = built.search_many({"b": ["merge", "scan"]}, k=7,
                             mode="OR").collect()
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(ranks) + 1))
    assert len(ranks) <= 7
