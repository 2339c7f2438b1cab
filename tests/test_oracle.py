"""BM25 oracle: hand-computed scores on a tiny corpus (SURVEY §5 test plan)."""

import math

from fatespark.oracle import B, BM25Oracle, K1, bm25_term_score, idf

DOCS = [
    (1, "the cat sat on the mat"),          # dl 6
    (2, "the dog"),                          # dl 2
    (3, "cat dog cat"),                      # dl 3
    (4, "Smith smith SMITH"),                # dl 3 (folds to smith x3)
    (5, ""),                                 # dl 0
]
# N=5, avgdl = (6+2+3+3+0)/5 = 2.8


def make():
    return BM25Oracle(DOCS)


def test_corpus_stats():
    o = make()
    assert o.n_docs == 5
    assert o.avgdl == 2.8
    assert o.doclen == {1: 6, 2: 2, 3: 3, 4: 3, 5: 0}


def test_count():
    o = make()
    assert o.count("the") == 2
    assert o.count("cat") == 2
    assert o.count("smith") == 1
    assert o.count("SMITH") == 1  # query folded
    assert o.count("missing") == 0


def test_hand_computed_single_term():
    o = make()
    # term 'cat': df=2, idf = ln(1 + (5-2+0.5)/(2+0.5)) = ln(2.4)
    iv = math.log(1 + 3.5 / 2.5)
    # doc3: tf=2, dl=3 -> 2*2.2 / (2 + 1.2*(0.25 + 0.75*3/2.8))
    s3 = iv * (2 * 2.2) / (2 + K1 * ((1 - B) + B * 3 / 2.8))
    s1 = iv * (1 * 2.2) / (1 + K1 * ((1 - B) + B * 6 / 2.8))
    got = o.search("cat", k=10, mode="OR")
    assert got == [(3, s3), (1, s1)]
    assert got[0][1] > got[1][1]


def test_and_vs_or():
    o = make()
    and_hits = o.search("cat dog", mode="AND")
    assert [d for d, _ in and_hits] == [3]
    or_hits = o.search("cat dog", mode="OR")
    assert {d for d, _ in or_hits} == {1, 2, 3}
    # AND score for doc3 equals its OR score (same summed terms)
    assert and_hits[0][1] == dict(or_hits)[3]


def test_tie_break_doc_id_asc():
    o = BM25Oracle([(10, "x y"), (2, "x y"), (7, "x y")])
    got = o.search("x", mode="OR")
    assert [d for d, _ in got] == [2, 7, 10]


def test_zero_hit_term():
    o = make()
    assert o.search("zzzz") == []
    assert o.search("zzzz cat", mode="AND") == []


def test_duplicate_query_terms_scored_once():
    o = make()
    assert o.search("cat cat") == o.search("cat")


def test_pagination():
    o = make()
    full = o.search("the cat dog", mode="OR", k=10)
    assert o.search("the cat dog", mode="OR", k=1, offset=1) == [full[1]]


def test_phrase():
    o = BM25Oracle([
        (1, "big array of stuff"),
        (2, "array big things"),
        (3, "the big array big array"),
    ])
    got = o.search_phrase("big array")
    assert {d for d, _ in got} == {1, 3}
    # doc3 has tf=2 for the phrase; doc1 tf=1
    tfs = {1: 1, 3: 2}
    iv = idf(3, 2)
    for d, s in got:
        assert s == bm25_term_score(tfs[d], o.doclen[d], o.avgdl, iv)


def test_prefix():
    o = BM25Oracle([(1, "fat cat"), (2, "faq page"), (3, "dog fates")])
    assert o.expand_prefix("fa") == ["faq", "fat", "fates"]
    got = o.search_prefix("fa")
    assert {d for d, _ in got} == {1, 2, 3}


def test_empty_corpus():
    o = BM25Oracle([])
    assert o.search("x") == []
    assert o.count("x") == 0
