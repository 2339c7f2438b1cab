"""combined_fields / Lucene CombinedFieldQuery: the field-concatenation
BM25 model. The defining law IS the test: with unit weights the scores
must equal plain BM25 over the concatenated text (BM25Oracle), and an
integer weight w must equal repeating that field w times."""

import math

import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.combinedfields import (combined_fields_search,
                                      combined_fields_sql)
from fatespark.oracle import BM25Oracle
from fatespark.query import SearchIndex

DOCS = [
    (1, "spark engine", "spark runs the spark engine fast"),
    (2, "join planner", "the planner chooses a join order"),
    (3, "spark tips", "tips and tricks collection"),
    (4, "misc notes", "spark appears only in the body here"),
    (5, "unrelated doc", "completely different content"),
    (6, "delta release", "notes about the delta delta format"),
    (7, "other title", "delta appears in this body"),
    (8, "another title", "and delta here too"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_root):
    d = str(tmp_root / "cfq_idx")
    df = spark.createDataFrame(DOCS,
                               "doc_id long, title string, body string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id",
        text_cols=["title", "body"], build_id="cfq")
    return SearchIndex(spark, d)


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _oracle_rows(docs, terms, k=10, mode="OR", quantize=4):
    ora = BM25Oracle(docs)
    qm = 10 ** quantize
    got = [(d, math.floor(s * qm) / qm)
           for d, s in ora.search(terms, k=10 ** 9, mode=mode)]
    return sorted(got, key=lambda x: (-x[1], x[0]))[:k]


class TestCombinedFields:
    @pytest.mark.parametrize("mode,q", [
        ("OR", ["spark", "delta"]),
        ("AND", ["spark", "engine"]),   # doc 1 holds both (cross-field)
    ])
    def test_concat_identity(self, idx, mode, q):
        """Unit weights == BM25 over 'title body' concatenation —
        union df, summed tf, combined dl all coincide by construction,
        so scores match floor-quantized."""
        concat = [(i, f"{t} {b}") for i, t, b in DOCS]
        want = _oracle_rows(concat, q, mode=mode)
        got = _rows(combined_fields_search(idx, q, k=10, mode=mode))
        assert got == want and got

    def test_integer_weight_is_field_repetition(self, idx):
        """weights=[2, 1] == BM25 over 'title title body': a field
        weight w multiplies its term counts AND its length share,
        which is exactly repeating the field w times (Robertson
        BM25F)."""
        rep = [(i, f"{t} {t} {b}") for i, t, b in DOCS]
        q = ["spark", "join"]
        want = _oracle_rows(rep, q)
        got = _rows(combined_fields_search(idx, q, k=10,
                                           weights=[2.0, 1.0]))
        assert got == want and got

    def test_differs_from_bm25f_sum(self, idx):
        """combined_fields is NOT the per-field score sum: 'spark' in
        both fields of doc 1 gets one combined saturation curve, not
        two independent ones."""
        cf = dict(_rows(combined_fields_search(idx, ["spark"], k=10)))
        f2 = dict(_rows(idx.search(["spark"], k=10, mode="OR",
                                   quantize=4)))
        assert set(cf) == set(f2)
        assert any(cf[d] != f2[d] for d in cf)

    def test_duckdb_twin_parity(self, spark, idx):
        import duckdb
        con = duckdb.connect()
        pdf = spark.createDataFrame(
            DOCS, "doc_id long, title string, body string").toPandas()
        con.register("docs2", pdf)
        for mode, q in (("OR", ["spark", "delta"]),
                        ("AND", ["spark", "engine"])):
            got = sorted(tuple(r) for r in combined_fields_search(
                idx, q, k=10, mode=mode).collect())
            want = sorted(tuple(r) for r in con.execute(
                combined_fields_sql(
                    "docs2", q, field_exprs=["title", "body"], k=10,
                    mode=mode)).fetchall())
            assert got == want and got, mode

    def test_validation(self, idx):
        with pytest.raises(ValueError):
            combined_fields_search(idx, ["spark"], k=0)
        with pytest.raises(ValueError):
            combined_fields_search(idx, ["spark"], weights=[1.0])
        with pytest.raises(ValueError):
            combined_fields_search(idx, ["spark"], weights=[0.0, 0.0])
