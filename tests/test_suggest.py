"""Spell suggestion: deletion-band completeness, ranking, JVM/python parity."""

import pytest
from pyspark.sql import functions as F

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.query import SearchIndex
from fatespark.suggest import deletion_variants, dictionary_variants, suggest

DOCS = [
    (1, "batch batch batch scan scan merge"),
    (2, "batch scan join sort short shirt"),
    (3, "match latch catch hatch batch"),
    (4, "scan scant scans span spin"),
    (5, "row slow grow crow low"),
]


def lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    d = str(tmp_root / "suggest_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="suggest")
    return SearchIndex(spark, d)


def test_jvm_variants_match_python(built):
    rows = dictionary_variants(built.terms).collect()
    got: dict[str, set] = {}
    for r in rows:
        got.setdefault(r["term"], set()).add(r["variant"])
    for term, vs in got.items():
        assert vs == set(deletion_variants(term)), term


def test_distance1_complete(built):
    """Every dictionary term within Levenshtein distance 1 of the query is
    found — the symmetric-delete guarantee at depth 1."""
    vocab = {r["term"]: r["df"] for r in built.terms.collect()}
    for q in ["scam", "batc", "batchy", "sow", "xbatch", "shirt"]:
        want = sorted(t for t in vocab if lev(q, t) <= 1)
        got = suggest(built, [q], k=100, max_edit=1).collect()
        assert sorted(r["suggestion"] for r in got) == want, q


def test_transpositions_surfaced(built):
    # adjacent transposition is distance 2 but always shares a depth-1
    # deletion variant ('bacth' ~ 'batch' via deleting either swapped char)
    got = suggest(built, ["bacth"], k=10, max_edit=2).collect()
    assert "batch" in [r["suggestion"] for r in got]


def test_verified_never_wrong(built):
    # every emitted pair satisfies the exact distance bound
    got = suggest(built, ["scam", "bacth", "shrt"], k=100,
                  max_edit=2).collect()
    for r in got:
        assert lev(r["qterm"], r["suggestion"]) == r["dist"] <= 2


def test_ranking_order(built):
    got = suggest(built, ["scam"], k=100, max_edit=2).collect()
    keys = [(r["dist"], -r["df"], r["suggestion"]) for r in got]
    assert keys == sorted(keys)
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    # closest first: 'scan' (dist 1) must precede any dist-2 candidate
    assert got[0]["suggestion"] == "scan"


def test_persisted_variants_path(built, tmp_root, spark):
    p = str(tmp_root / "suggest_variants")
    dictionary_variants(built.terms).write.mode("overwrite").parquet(p)
    pre = spark.read.parquet(p)
    a = suggest(built, ["scam"], k=5, max_edit=2).collect()
    b = suggest(built, ["scam"], k=5, max_edit=2, variants=pre).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_plan_is_banded_equi_join(built):
    """The candidate generator must be a broadcast equi-join on the band
    key — no all-pairs comparison of query terms against the dictionary."""
    p = suggest(built, ["scam"], k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
