"""Parent/child block join (fatespark.blockjoin): has_child score modes
against brute-force over BM25Oracle scores, the to-children expansion,
and the DuckDB twin."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fatespark import blockjoin
from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_pandas
from fatespark.oracle import BM25Oracle
from fatespark.query import SearchIndex


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = pages_pandas(np.arange(250))
    df = (spark.createDataFrame(pdf[["url", "text"]])
          .withColumn("doc_id", F.xxhash64("url"))
          .withColumn("parent", F.pmod(F.col("doc_id"), F.lit(7)))
          .select("doc_id", "text", "parent"))
    return df.persist()


@pytest.fixture(scope="module")
def idx(spark, corpus, tmp_root):
    d = str(tmp_root / "blockjoin_idx")
    IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=0)).build(
        spark, corpus, id_col="doc_id", url_col="doc_id",
        text_col="text", build_id="bj")
    return SearchIndex(spark, d)


def _families(corpus, q, mode, quantize=4):
    """parent -> list of child integer score codes, brute via the
    pure-Python BM25 oracle."""
    rows = corpus.select("doc_id", "text", "parent").collect()
    ora = BM25Oracle([(r["doc_id"], r["text"]) for r in rows])
    par = {r["doc_id"]: str(r["parent"]) for r in rows}
    fam = {}
    for d, s in ora.search(q, k=10 ** 9, mode=mode):
        fam.setdefault(par[d], []).append(
            int(math.floor(s * 10 ** quantize)))
    return fam


class TestHasChild:
    @pytest.mark.parametrize("score_mode", ["max", "sum", "avg", "min"])
    def test_matches_brute_force(self, corpus, idx, score_mode):
        q, mode, k = ["term00010", "term00050"], "OR", 5
        fam = _families(corpus, q, mode)
        qm = 1e4
        exp = []
        for p, codes in fam.items():
            if score_mode == "max":
                s = max(codes) / qm
            elif score_mode == "min":
                s = min(codes) / qm
            elif score_mode == "sum":
                s = sum(codes) / qm
            else:
                s = (sum(codes) / qm) / len(codes)
            exp.append((-s, p, len(codes)))
        exp = [(p, -ns, n) for ns, p, n in sorted(exp)[:k]]
        got = [(r["parent"], r["score"], r["n_children"])
               for r in blockjoin.has_child_topk(
                   idx, corpus, q, "parent", k=k, mode=mode,
                   score_mode=score_mode).collect()]
        assert got == exp and got

    def test_min_children_floor(self, corpus, idx):
        q = ["the"]
        fam = _families(corpus, q, "OR")
        floor = 2
        keep = {p for p, codes in fam.items() if len(codes) >= floor}
        got = blockjoin.has_child_topk(
            idx, corpus, q, "parent", k=100, min_children=floor).collect()
        assert {r["parent"] for r in got} == keep
        assert all(r["n_children"] >= floor for r in got)

    def test_none_mode_constant_score(self, corpus, idx):
        got = blockjoin.has_child_topk(
            idx, corpus, ["the"], "parent", k=100,
            score_mode="none").collect()
        assert got and all(r["score"] == 0.0 for r in got)
        # ordering degenerates to parent asc
        ps = [r["parent"] for r in got]
        assert ps == sorted(ps)

    def test_duckdb_twin_parity(self, spark, corpus, idx):
        import duckdb
        pdf = corpus.select("doc_id", "text", "parent").toPandas()
        con = duckdb.connect()
        con.register("documents", pdf)
        for sm in ("max", "sum", "avg"):
            got = sorted(tuple(r) for r in blockjoin.has_child_topk(
                idx, corpus, ["term00010", "term00050"], "parent",
                k=4, score_mode=sm).collect())
            want = sorted(tuple(r) for r in con.execute(
                blockjoin.has_child_sql(
                    "documents", ["term00010", "term00050"], "d.parent",
                    k=4, score_mode=sm)).fetchall())
            assert got == want and got, sm

    def test_validation(self, corpus, idx):
        with pytest.raises(ValueError):
            blockjoin.has_child_topk(idx, corpus, ["the"], "parent", k=0)
        with pytest.raises(ValueError):
            blockjoin.has_child_topk(idx, corpus, ["the"], "parent",
                                     score_mode="prod")
        with pytest.raises(ValueError):
            blockjoin.has_child_topk(idx, corpus, ["the"], "parent",
                                     min_children=0)


class TestToChildren:
    def test_expands_matching_families(self, corpus, idx):
        q = ["term00010"]
        fam = _families(corpus, q, "OR")
        qm = 1e4
        exp_score = {p: max(codes) / qm for p, codes in fam.items()}
        kids = {}
        for r in corpus.select("doc_id", "parent").collect():
            kids.setdefault(str(r["parent"]), set()).add(r["doc_id"])
        exp = {(d, p, exp_score[p])
               for p in exp_score for d in kids[p]}
        got = {(r["doc_id"], r["parent"], r["score"])
               for r in blockjoin.to_children(
                   idx, corpus, q, "parent").collect()}
        assert got == exp and got
        # non-matching siblings ride along — the family expansion claim
        matched = {d for p, codes in fam.items() for d in ()}
        assert len(got) > sum(len(c) for c in fam.values()) or \
            all(len(kids[p]) == len(fam[p]) for p in fam)

    def test_k_cut(self, corpus, idx):
        got = blockjoin.to_children(idx, corpus, ["the"], "parent",
                                    k=7).collect()
        assert len(got) == 7
        scores = [r["score"] for r in got]
        assert scores == sorted(scores, reverse=True)

    def test_duckdb_twin_parity(self, spark, corpus, idx):
        import duckdb
        con = duckdb.connect()
        con.register("documents",
                     corpus.select("doc_id", "text", "parent").toPandas())
        got = sorted(tuple(r) for r in blockjoin.to_children(
            idx, corpus, ["term00010"], "parent").collect())
        want = sorted(tuple(r) for r in con.execute(
            blockjoin.to_children_sql("documents", ["term00010"],
                                      "d.parent")).fetchall())
        assert got == want and got


class TestInnerHits:
    def test_matches_brute_force(self, corpus, idx):
        q, k, n = ["term00010", "term00050"], 4, 2
        fam = _families(corpus, q, "OR")
        qm = 1e4
        # brute: parents ranked by max code, then per parent the n best
        # child (code, doc) pairs
        codes = {}
        rows = corpus.select("doc_id", "text", "parent").collect()
        from fatespark.oracle import BM25Oracle
        ora = BM25Oracle([(r["doc_id"], r["text"]) for r in rows])
        par = {r["doc_id"]: str(r["parent"]) for r in rows}
        for d, s in ora.search(q, k=10 ** 9, mode="OR"):
            codes.setdefault(par[d], []).append(
                (int(math.floor(s * qm)), d))
        top = sorted(((-max(c for c, _ in lst) / qm, p)
                      for p, lst in codes.items()))[:k]
        exp = set()
        for ns, p in top:
            best = sorted(((-c / qm, d) for c, d in codes[p]))[:n]
            for rank, (nc, d) in enumerate(best, 1):
                exp.add((p, -ns, d, -nc, rank))
        got = {(r["parent"], r["parent_score"], r["doc_id"],
                r["child_score"], r["hit_rank"])
               for r in blockjoin.has_child_inner_hits(
                   idx, corpus, q, "parent", k=k, n=n,
                   score_mode="max").collect()}
        assert got == exp and got

    def test_duckdb_twin_parity(self, spark, corpus, idx):
        import duckdb
        con = duckdb.connect()
        con.register("documents",
                     corpus.select("doc_id", "text", "parent").toPandas())
        got = sorted(tuple(r) for r in blockjoin.has_child_inner_hits(
            idx, corpus, ["term00010", "term00050"], "parent",
            k=3, n=2, score_mode="sum").collect())
        want = sorted(tuple(r) for r in con.execute(
            blockjoin.inner_hits_sql(
                "documents", ["term00010", "term00050"], "d.parent",
                k=3, n=2, score_mode="sum")).fetchall())
        assert got == want and got

    def test_parents_match_has_child(self, corpus, idx):
        q = ["the"]
        hc = blockjoin.has_child_topk(idx, corpus, q, "parent",
                                      k=5).collect()
        ih = blockjoin.has_child_inner_hits(idx, corpus, q, "parent",
                                            k=5, n=1).collect()
        assert {r["parent"] for r in ih} == {r["parent"] for r in hc}
        ps = {r["parent"]: r["score"] for r in hc}
        assert all(r["parent_score"] == ps[r["parent"]] for r in ih)

    def test_validation(self, corpus, idx):
        with pytest.raises(ValueError):
            blockjoin.has_child_inner_hits(idx, corpus, ["the"],
                                           "parent", n=0)
