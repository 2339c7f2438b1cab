"""Synonym graph: multi-word clause matching, position-sum law,
degeneration to SpanOr, adjacency strictness."""

import pytest
from pyspark.sql import functions as F

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.query import SearchIndex

DOCS = [
    (1, "merge sort merge"),
    (2, "batch scan fast table"),
    (3, "row row row key"),
    (4, "slow scan batch order"),          # batch/scan NOT adjacent
    (5, "merge batch scan row"),
    (6, "key value store"),
]

GRAPH = {"merge": ["batch scan"], "row": ["slow"]}


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    d = str(tmp_root / "syng_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="syng")
    return SearchIndex(spark, d)


def test_multiword_clause_matches_adjacent_only(built):
    got = {r["doc_id"] for r in built.search_synonym_graph(
        ["merge"], GRAPH, k=10).collect()}
    # doc 2 and 5 match via adjacent "batch scan"; doc 4 has the words
    # non-adjacent and matches NOTHING for this position
    assert got == {1, 2, 5}


def test_score_is_sum_of_position_pseudo_terms(built):
    got = {r["doc_id"]: r["score"] for r in built.search_synonym_graph(
        ["merge", "row"], GRAPH, k=10).collect()}
    p0 = {r["doc_id"]: r["score"] for r in built.search_phrases_any(
        ["merge", "batch scan"], k=10).collect()}
    p1 = {r["doc_id"]: r["score"] for r in built.search_phrases_any(
        ["row", "slow"], k=10).collect()}
    assert set(got) == set(p0) | set(p1)
    for d, s in got.items():
        assert s == pytest.approx(p0.get(d, 0.0) + p1.get(d, 0.0),
                                  rel=1e-12), d


def test_single_position_degenerates_to_span_or(built):
    a = built.search_synonym_graph(["merge"], GRAPH, k=10,
                                   quantize=4).collect()
    b = built.search_phrases_any(["merge", "batch scan"], k=10,
                                 quantize=4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_position_without_synonyms_is_plain_term(built):
    a = built.search_synonym_graph(["key"], {}, k=10,
                                   quantize=4).collect()
    b = built.search_phrases_any(["key"], k=10, quantize=4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert {r["doc_id"] for r in a} == {3, 6}


def test_or_semantics_and_unmatched_position(built):
    # 'zzz' matches nothing: docs still qualify through the other
    # position, with the dead position contributing 0
    a = built.search_synonym_graph(["row", "zzz"], GRAPH, k=10,
                                   quantize=4).collect()
    b = built.search_phrases_any(["row", "slow"], k=10,
                                 quantize=4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_all_positions_unmatched_empty(built):
    assert built.search_synonym_graph(["zzz"], {}, k=10).collect() == []


def test_validation(built):
    with pytest.raises(ValueError):
        built.search_synonym_graph([], GRAPH)
