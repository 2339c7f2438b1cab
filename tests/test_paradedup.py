"""Corpus-wide paragraph dedup with text rewrite (CCNet-style).

Brute-force parity: the canonical occurrence of every duplicated paragraph
(global min (doc_id, idx)) survives, every other occurrence is cut, empty
paragraphs always survive, and the reassembled text digests match a pure
Python twin exactly.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from fatespark.dedup import paragraph_dedup_df


def _fold(s: str) -> str:
    # ascii inputs in these tests; textops.fold_col is ascii-only translate
    return s.lower()


def _expected(rows):
    first = {}
    for i, t in rows:
        for j, p in enumerate((t or "").split("\n")):
            k, ne = _fold(p.strip()), p.strip() != ""
            if ne and k not in first:
                first[k] = (i, j)
    exp = {}
    for i, t in rows:
        keep, npar, ndrop = [], 0, 0
        for j, p in enumerate((t or "").split("\n")):
            k, ne = _fold(p.strip()), p.strip() != ""
            if ne:
                npar += 1
                if first[k] == (i, j):
                    keep.append(p)
                else:
                    ndrop += 1
            else:
                keep.append(p)
        ct = "\n".join(keep)
        exp[i] = (npar, ndrop, len(ct),
                  hashlib.md5(ct.encode()).hexdigest())
    return exp


ROWS = [
    (1, "Alpha beta\nSHARED LINE one\ngamma"),
    (2, "delta\nshared line ONE\nSHARED LINE one"),  # fold-dups of doc1 line
    (3, "  \nunique here\n"),                        # empty paras survive
    (4, None),
    (5, "shared line one"),                          # whole doc is a dup
    (6, "alpha beta\nAlpha Beta\nalpha  beta"),      # within-doc dups (note:
    # 'alpha  beta' differs — double space — so it is NOT a dup)
]


class TestParagraphDedup:
    def test_brute_force_parity(self, spark):
        df = spark.createDataFrame(ROWS, "doc_id long, text string")
        out = {r.id: (r.n_paras, r.n_dropped, r.clean_len, r.clean_md5)
               for r in paragraph_dedup_df(df).collect()}
        assert out == _expected(ROWS)

    def test_one_row_per_doc(self, spark):
        df = spark.createDataFrame(ROWS, "doc_id long, text string")
        out = paragraph_dedup_df(df)
        assert out.count() == len(ROWS)
        assert out.select("id").distinct().count() == len(ROWS)

    def test_no_dups_is_identity(self, spark):
        rows = [(1, "a b\nc d"), (2, "e f\ng h")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for r in paragraph_dedup_df(df).collect():
            assert r.n_dropped == 0
            src = dict(rows)[r.id]
            assert r.clean_md5 == hashlib.md5(src.encode()).hexdigest()

    def test_partition_invariance(self, spark):
        """Canonical pick is (doc_id, idx)-min, not partition order."""
        df = spark.createDataFrame(ROWS, "doc_id long, text string")
        a = sorted(map(tuple, paragraph_dedup_df(df).collect()))
        b = sorted(map(tuple,
                       paragraph_dedup_df(df.repartition(7)).collect()))
        c = sorted(map(tuple,
                       paragraph_dedup_df(
                           df.orderBy(F.desc("doc_id"))).collect()))
        assert a == b == c

    def test_map_side_combinable_agg(self, spark):
        """The canonical-occurrence aggregate must partial-aggregate
        map-side (min/count are combinable) — that is what absorbs a
        boilerplate paragraph shared by 10^8 pages before the shuffle."""
        df = spark.createDataFrame(ROWS, "doc_id long, text string")
        plan = paragraph_dedup_df(df)._jdf.queryExecution().executedPlan() \
                                     .toString()
        assert "partial_min" in plan or "HashAggregate" in plan
