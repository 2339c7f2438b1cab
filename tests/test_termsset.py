"""terms_set: per-doc msm floors, OR-score identity, clamp, absents."""

import pytest
from pyspark.sql import functions as F

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.oracle import BM25Oracle
from fatespark.query import SearchIndex
from fatespark.termsset import terms_set_search

DOCS = [
    (1, "batch join scan merge"),       # all 3
    (2, "batch join sort"),             # 2 of 3
    (3, "batch batch row"),             # 1 of 3
    (4, "scan scan scan join batch"),   # all 3
    (5, "merge sort row"),              # 0 of 3
]
TERMS = ["batch", "join", "scan"]
FLOORS = {1: 3, 2: 3, 3: 1, 4: 2, 5: 1}


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    d = str(tmp_root / "tset_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="tset")
    floors = spark.createDataFrame(
        [(i, m) for i, m in FLOORS.items()], "doc_id long, req_m int")
    return SearchIndex(spark, d), floors


def test_per_doc_floors_and_scores(built):
    idx, floors = built
    got = terms_set_search(idx, floors, TERMS, "req_m", k=10).collect()
    # doc 1: 3 matched >= 3 ok; doc 2: 2 < 3 out; doc 3: 1 >= 1 ok;
    # doc 4: 3 >= 2 ok; doc 5: 0 matched never qualifies
    assert {r["doc_id"] for r in got} == {1, 3, 4}
    o = BM25Oracle(DOCS)
    want = dict(o.search(TERMS, k=10, mode="OR"))
    for r in got:
        assert r["score"] == pytest.approx(want[r["doc_id"]], rel=1e-12)
        assert r["req_m"] == FLOORS[r["doc_id"]]
    # full OR sum, not a truncated one: order follows the OR ranking
    ranked = [d for d, _ in o.search(TERMS, k=10, mode="OR")
              if d in {1, 3, 4}]
    assert [r["doc_id"] for r in got] == ranked


def test_floor_clamps_to_one(built, spark):
    idx, _ = built
    floors = spark.createDataFrame(
        [(i, 0) for i, _ in DOCS], "doc_id long, req_m int")
    got = {r["doc_id"] for r in
           terms_set_search(idx, floors, TERMS, "req_m", k=10).collect()}
    assert got == {1, 2, 3, 4}   # clamp(0) == 1: any match qualifies


def test_unsatisfiable_floor(built, spark):
    idx, _ = built
    floors = spark.createDataFrame(
        [(i, 9) for i, _ in DOCS], "doc_id long, req_m int")
    assert terms_set_search(idx, floors, TERMS, "req_m",
                            k=10).collect() == []


def test_absent_terms_dont_count(built):
    idx, floors = built
    got = {r["doc_id"]: r["n_matched"] for r in terms_set_search(
        idx, floors.select("doc_id",
                           F.lit(1).cast("int").alias("req_m")),
        ["batch", "zzz_missing"], "req_m", k=10).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_validation(built):
    idx, floors = built
    with pytest.raises(ValueError):
        terms_set_search(idx, floors, [""], "req_m")
