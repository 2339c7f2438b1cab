"""Field-sorted retrieval: brute parity against a corpus re-scan, both
directions, AND/OR match sets, tombstone hygiene, and the k-bounded
TakeOrderedAndProject plan (never a full sort)."""

import pytest
from pyspark.sql import functions as F

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_df
from fatespark.query import SearchIndex, search_sorted_by


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sortby") / "idx")
    corpus = pages_df(spark, 800, partitions=4).select(
        F.xxhash64("url").alias("doc_id"), "url", "text").withColumn(
        "n_chars", F.length("text")).localCheckpoint()
    IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1)).build(
        spark, corpus, id_col="doc_id", build_id="sb")
    return SearchIndex(spark, d), corpus


def _brute(corpus, terms, mode, field, asc, k):
    rows = [(r["doc_id"], set((r["text"] or "").lower().split()),
             r[field]) for r in corpus.collect()]
    want = [(d, v) for d, toks, v in rows
            if (all(t in toks for t in terms) if mode == "AND"
                else any(t in toks for t in terms))]
    want.sort(key=lambda x: ((x[1] if asc else -x[1]), x[0]))
    return want[:k]


@pytest.mark.parametrize("mode,asc", [("OR", False), ("OR", True),
                                      ("AND", False)])
def test_matches_brute(fixture, mode, asc):
    idx, corpus = fixture
    got = [(r["doc_id"], r["n_chars"]) for r in
           search_sorted_by(idx, corpus, ["smith", "jones"], "n_chars",
                            k=10, mode=mode, ascending=asc).collect()]
    assert got == _brute(corpus, ["smith", "jones"], mode, "n_chars",
                         asc, 10)


def test_tombstoned_docs_drop(fixture, spark):
    idx, corpus = fixture
    import numpy as np
    top = search_sorted_by(idx, corpus, ["smith"], "n_chars", k=3,
                           mode="OR", ascending=False).collect()
    victims = [int(r["doc_id"]) for r in top]
    idx.tombstones = np.sort(np.asarray(victims, dtype=np.int64))
    try:
        got = [r["doc_id"] for r in
               search_sorted_by(idx, corpus, ["smith"], "n_chars", k=10,
                                mode="OR", ascending=False).collect()]
        assert not set(got) & set(victims)
    finally:
        idx.tombstones = None


def test_kbounded_plan(fixture):
    idx, corpus = fixture
    df = search_sorted_by(idx, corpus, ["smith"], "n_chars", k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # any Sort in the plan must be partition-LOCAL (the groupBy/join
    # machinery), never a global sort of the match set
    for ln in plan.splitlines():
        s = ln.strip()
        if s.startswith(("Sort ", "+- Sort ", ":- Sort ")) or \
                " Sort [" in ln:
            assert ", false, 0" in ln, ln
