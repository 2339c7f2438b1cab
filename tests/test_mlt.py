"""More-like-this: seed term selection and related-doc ranking."""

import math
from collections import Counter

import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.mlt import more_like_this, seed_terms
from fatespark.query import SearchIndex

DOCS = [
    (1, "spark shuffle join broadcast join join"),
    (2, "spark shuffle partition skew"),
    (3, "join broadcast hash hash"),
    (4, "cats dogs birds fish"),
    (5, "dogs dogs cats hamster"),
    (6, "spark join broadcast shuffle skew"),
    (7, "the the the of of and"),
]


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    d = str(tmp_root / "mlt_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="mlt")
    idx = SearchIndex(spark, d)
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    return idx, corpus


def test_seed_terms_brute_force(built):
    idx, _ = built
    n = idx.n_docs
    dfc = Counter()
    for _, t in DOCS:
        dfc.update(set(t.split()))
    for _, text in DOCS:
        tf = Counter(text.split())
        want = sorted(
            ((-tf[t] * math.log(1.0 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5)), t)
             for t in tf), )
        want = [t for _, t in want[:3]]
        assert seed_terms(idx, text, m=3) == want


def test_related_docs_cluster(built):
    idx, corpus = built
    # seed 1 (spark/join cluster) must surface 6, 2, 3 — never the
    # animal docs
    got = [r["doc_id"] for r in
           more_like_this(idx, corpus, 1, k=3, m=4).collect()]
    assert set(got) <= {2, 3, 6}
    assert 6 in got


def test_seed_excluded_and_exact(built):
    idx, corpus = built
    terms = seed_terms(idx, dict(DOCS)[5], m=4)
    manual = [(r["doc_id"], r["score"]) for r in
              idx.search(terms, k=8, mode="OR").collect()
              if r["doc_id"] != 5][:7]
    got = [(r["doc_id"], r["score"]) for r in
           more_like_this(idx, corpus, 5, k=7, m=4).collect()]
    assert got == manual
    assert all(d != 5 for d, _ in got)


def test_missing_doc_empty(built):
    idx, corpus = built
    assert more_like_this(idx, corpus, 999, k=5).count() == 0
