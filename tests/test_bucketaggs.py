"""ES bucket aggregations (fatespark.bucketaggs): top_hits per-group
ranking and adjacency_matrix filter-intersection counts, both against
brute-force twins over the same match sets."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fatespark import bucketaggs
from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_pandas
from fatespark.query import SearchIndex


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = pages_pandas(np.arange(250))
    df = (spark.createDataFrame(pdf[["url", "text"]])
          .withColumn("doc_id", F.xxhash64("url"))
          .withColumn("n_chars", F.length("text"))
          .withColumn("grp", F.pmod(F.col("doc_id"), F.lit(5)))
          .select("doc_id", "text", "n_chars", "grp"))
    return df.persist()


@pytest.fixture(scope="module")
def idx(spark, corpus, tmp_root):
    d = str(tmp_root / "bucketaggs_idx")
    IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=0)).build(
        spark, corpus, id_col="doc_id", url_col="doc_id",
        text_col="text", build_id="ba")
    return SearchIndex(spark, d)


def _match_set(idx, q, mode):
    return {r["doc_id"] for r in idx.matching_docs(q, mode=mode).collect()}


class TestTopHits:
    def test_matches_brute_force(self, spark, corpus, idx):
        q, mode, n = ["term00010", "term00050"], "OR", 3
        ms = _match_set(idx, q, mode)
        rows = corpus.select("doc_id", "grp", "n_chars").collect()
        per = {}
        for r in rows:
            if r["doc_id"] in ms:
                per.setdefault(r["grp"], []).append(
                    (-r["n_chars"], r["doc_id"]))
        exp = set()
        for g, lst in per.items():
            for rank, (nc, d) in enumerate(sorted(lst)[:n], 1):
                exp.add((g, d, -nc, rank))
        got = {(r["group"], r["doc_id"], r["n_chars"], r["hit_rank"])
               for r in bucketaggs.top_hits_agg(
                   idx, corpus, q, "grp", "n_chars", n=n,
                   mode=mode).collect()}
        assert got == exp

    def test_output_bounded_by_groups_times_n(self, spark, corpus, idx):
        out = bucketaggs.top_hits_agg(idx, corpus, ["the"], "grp",
                                      "n_chars", n=2, mode="OR")
        cnt = out.groupBy("group").count().collect()
        assert all(r["count"] <= 2 for r in cnt)
        assert len(cnt) <= 5

    def test_ascending_sort(self, spark, corpus, idx):
        out = bucketaggs.top_hits_agg(
            idx, corpus, ["the"], "grp", "n_chars", n=1, mode="OR",
            ascending=True).collect()
        ms = _match_set(idx, ["the"], "OR")
        rows = [r for r in corpus.collect() if r["doc_id"] in ms]
        for o in out:
            best = min((r["n_chars"], r["doc_id"]) for r in rows
                       if r["grp"] == o["group"])
            assert (o["n_chars"], o["doc_id"]) == best


class TestAdjacencyMatrix:
    def test_matches_brute_force(self, spark, corpus, idx):
        filters = {"a": ["term00010"], "b": ["term00050"], "c": ["search"]}
        sets = {k: _match_set(idx, v, "OR") for k, v in filters.items()}
        exp = {}
        for k, s in sets.items():
            if s:
                exp[k] = len(s)
        names = sorted(filters)
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                inter = sets[names[i]] & sets[names[j]]
                if inter:
                    exp[f"{names[i]}&{names[j]}"] = len(inter)
        got = {r["key"]: r["doc_count"] for r in
               bucketaggs.adjacency_matrix_agg(idx, filters).collect()}
        assert got == exp

    def test_single_filter(self, spark, corpus, idx):
        got = {r["key"]: r["doc_count"] for r in
               bucketaggs.adjacency_matrix_agg(
                   idx, {"only": ["the"]}).collect()}
        assert got == {"only": len(_match_set(idx, ["the"], "OR"))}

    def test_empty_filters_raise(self, idx):
        with pytest.raises(ValueError):
            bucketaggs.adjacency_matrix_agg(idx, {})


class TestTopHitsScored:
    def test_matches_oracle_scores_per_group(self, spark, corpus, idx):
        """Per-group top-3 by BM25 == brute-force over BM25Oracle
        scores (quantized), both modes."""
        import math
        from fatespark.oracle import BM25Oracle
        rows = corpus.select("doc_id", "text", "grp").collect()
        ora = BM25Oracle([(r["doc_id"], r["text"]) for r in rows])
        grp = {r["doc_id"]: r["grp"] for r in rows}
        for mode in ("OR", "AND"):
            q = ["term00010", "term00050"]
            scored = ora.search(q, k=10 ** 9, mode=mode)
            per = {}
            for d, s in scored:
                qs = math.floor(s * 1e4) / 1e4
                per.setdefault(str(grp[d]), []).append((-qs, d))
            exp = set()
            for g, lst in per.items():
                for rank, (ns, d) in enumerate(sorted(lst)[:3], 1):
                    exp.add((g, d, -ns, rank))
            got = {(r["group"], r["doc_id"], r["score"], r["hit_rank"])
                   for r in bucketaggs.top_hits_scored_agg(
                       idx, corpus, q, "grp", n=3, mode=mode).collect()}
            assert got == exp, mode

    def test_duckdb_twin_parity(self, spark, corpus, idx):
        import duckdb
        pdf = corpus.select("doc_id", "text", "grp").toPandas()
        con = duckdb.connect()
        con.register("documents", pdf)
        got = sorted(tuple(r) for r in bucketaggs.top_hits_scored_agg(
            idx, corpus, ["term00010", "term00050"], "grp",
            n=2, mode="OR").collect())
        want = sorted(tuple(r) for r in con.execute(
            bucketaggs.top_hits_scored_sql(
                "documents", ["term00010", "term00050"], "grp",
                n=2, mode="OR")).fetchall())
        assert got == want and got

    def test_validation(self, idx, corpus):
        with pytest.raises(ValueError):
            bucketaggs.top_hits_scored_agg(idx, corpus, ["the"], "grp",
                                           n=0)


class TestDiversifiedSampler:
    def test_matches_brute_force(self, spark, corpus, idx):
        import math
        from fatespark.oracle import BM25Oracle
        rows = corpus.select("doc_id", "text", "grp").collect()
        ora = BM25Oracle([(r["doc_id"], r["text"]) for r in rows])
        grp = {r["doc_id"]: str(r["grp"]) for r in rows}
        q, cap = ["term00010", "the"], 2
        per = {}
        for d, s in ora.search(q, k=10 ** 9, mode="OR"):
            qs = math.floor(s * 1e4) / 1e4
            per.setdefault(grp[d], []).append((-qs, d))
        exp = set()
        for g, lst in per.items():
            for rank, (ns, d) in enumerate(sorted(lst)[:cap], 1):
                exp.add((g, d, -ns, rank))
        got = {(r["key"], r["doc_id"], r["score"], r["dup_rank"])
               for r in bucketaggs.diversified_sampler(
                   idx, corpus, q, "grp",
                   max_docs_per_value=cap).collect()}
        assert got == exp and got

    def test_per_key_bound(self, corpus, idx):
        out = bucketaggs.diversified_sampler(
            idx, corpus, ["the"], "grp", max_docs_per_value=3)
        cnt = out.groupBy("key").count().collect()
        assert cnt and all(r["count"] <= 3 for r in cnt)

    def test_validation(self, corpus, idx):
        with pytest.raises(ValueError):
            bucketaggs.diversified_sampler(idx, corpus, ["the"], "grp",
                                           max_docs_per_value=0)
