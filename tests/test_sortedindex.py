"""Index sorting + early-terminated sorted retrieval
(fatespark.sortedindex): global rank correctness, early-stop parity with
the full-match-set path, pushed range filter, galloping fallback,
tombstone consistency."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fatespark import sortedindex
from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_pandas
from fatespark.query import SearchIndex, search_sorted_by


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pages_pandas(np.arange(300))
    df = (spark.createDataFrame(pdf[["url", "text"]])
          .withColumn("doc_id", F.xxhash64("url"))
          .withColumn("n_chars", F.length("text"))
          .select("doc_id", "text", "n_chars").repartition(6))
    return df.persist()


@pytest.fixture(scope="module")
def sorted_idx(spark, docs, tmp_root):
    d = str(tmp_root / "sorted_idx")
    idx = sortedindex.build_sorted(
        spark, docs, d, "n_chars", ascending=False,
        config=BuildConfig(n_buckets=4, salt_bits=0))
    return idx


def _expected_rank(docs):
    pdf = docs.select("doc_id", "n_chars").toPandas()
    pdf = pdf.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
    return {int(r.doc_id): i + 1 for i, r in pdf.iterrows()}


class TestRankAssign:
    def test_rank_is_global_dense_and_ordered(self, spark, docs):
        out = sortedindex.rank_assign(docs, "n_chars", ascending=False,
                                      tiebreak="doc_id").toPandas()
        exp = _expected_rank(docs)
        assert sorted(out["rank"]) == list(range(1, len(out) + 1))
        got = dict(zip(out["doc_id"].astype(int), out["rank"].astype(int)))
        assert got == exp

    def test_partition_count_invariance(self, spark, docs):
        a = sortedindex.rank_assign(docs, "n_chars", num_partitions=2
                                    ).select("doc_id", "rank").toPandas()
        b = sortedindex.rank_assign(docs, "n_chars", num_partitions=11
                                    ).select("doc_id", "rank").toPandas()
        ga = dict(zip(a.doc_id, a["rank"]))
        gb = dict(zip(b.doc_id, b["rank"]))
        assert ga == gb

    def test_ascending(self, spark, docs):
        out = sortedindex.rank_assign(docs, "n_chars", ascending=True
                                      ).select("n_chars", "rank").toPandas()
        out = out.sort_values("rank")
        assert list(out.n_chars) == sorted(out.n_chars)


class TestSearchSortedEarly:
    @pytest.mark.parametrize("mode,q", [
        ("AND", ["term00001", "term00002"]),
        ("OR", ["term00050", "zyzzyva"]),
        ("AND", ["the"]),
    ])
    def test_parity_with_full_sorted_path(self, spark, docs, sorted_idx,
                                          mode, q):
        """Early-terminated == search_sorted_by over the same sorted index
        (full match set, ordered by the same rank)."""
        got = [r["doc_id"] for r in sortedindex.search_sorted_early(
            sorted_idx, q, k=10, mode=mode).collect()]
        full = search_sorted_by(
            sorted_idx, sorted_idx.docs.withColumn(
                "rk", F.col("doc_id")), q, "rk", k=10, mode=mode)
        exp = [r["doc_id"] for r in full.collect()]
        assert got == exp
        assert got == sorted(got)

    def test_early_stop_probes_prefix_only(self, spark, sorted_idx):
        """A head term finds k matches in the first probe, far below
        n_docs — the horizon never reaches a full scan."""
        probes = []
        out = sortedindex.search_sorted_early(
            sorted_idx, ["the"], k=5, mode="AND", _probes_out=probes)
        assert out.count() == 5
        assert len(probes) == 1
        assert probes[0] < sorted_idx.n_docs // 2

    def test_galloping_fallback_exhausts(self, spark, sorted_idx):
        """A match set smaller than k ends at the full-scan horizon and
        returns every match."""
        probes = []
        out = sortedindex.search_sorted_early(
            sorted_idx, ["term00001", "term00002"], k=10 ** 6, mode="AND",
            _probes_out=probes)
        m = sorted_idx.matching_docs(["term00001", "term00002"], mode="AND")
        assert m.count() > 0
        assert out.count() == m.count()
        assert probes[-1] == sorted_idx.n_docs + 1

    def test_pushed_range_filter(self, spark, sorted_idx):
        """The galloping probe's first_doc < T predicate reaches the
        parquet scan (PushedFilters) — blocks past the horizon are never
        read."""
        blocks = sorted_idx.postings.filter(
            F.col("term").isin(["the"]) & (F.col("first_doc") < F.lit(64)))
        plan = blocks._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan
        assert "LessThan(first_doc" in plan

    def test_with_url_maps_back_to_original_ids(self, spark, docs,
                                                sorted_idx):
        out = sortedindex.search_sorted_early(
            sorted_idx, ["term00001", "term00002"], k=5, mode="AND",
            with_url=True).toPandas()
        origs = set(out["url"].astype(str))
        all_ids = {str(r["doc_id"]) for r in docs.collect()}
        assert origs <= all_ids
        exp = _expected_rank(docs)
        for r in out.itertuples():
            assert exp[int(r.url)] == int(r.doc_id)

    def test_tombstones_respected(self, spark, docs, tmp_root):
        d = str(tmp_root / "sorted_idx_tomb")
        idx = sortedindex.build_sorted(
            spark, docs, d, "n_chars", ascending=False,
            config=BuildConfig(n_buckets=2, salt_bits=0))
        first = [r["doc_id"] for r in sortedindex.search_sorted_early(
            idx, ["the"], k=3, mode="AND").collect()]
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)) \
            .delete_docs(spark, first[:2])
        idx2 = SearchIndex(spark, d)
        after = [r["doc_id"] for r in sortedindex.search_sorted_early(
            idx2, ["the"], k=3, mode="AND").collect()]
        assert not set(after) & set(first[:2])
        assert after[0] == first[2]

    def test_cursor_pagination_tiles_the_full_order(self, spark, docs,
                                                    sorted_idx):
        """Walking pages with after=<last rank> reproduces the full
        sorted match list with no gap or overlap, and each page's probe
        horizon moves PAST the cursor (deep pages stay O(k)-shaped)."""
        q = ["term00001", "term00002"]
        full = [r["doc_id"] for r in sortedindex.search_sorted_early(
            sorted_idx, q, k=10 ** 6, mode="AND").collect()]
        pages, cursor = [], None
        while True:
            probes = []
            page = [r["doc_id"] for r in sortedindex.search_sorted_early(
                sorted_idx, q, k=7, mode="AND", after=cursor,
                _probes_out=probes).collect()]
            if cursor is not None and page:
                assert min(probes) > cursor - 1
                assert all(d > cursor for d in page)
            if not page:
                break
            pages.extend(page)
            cursor = page[-1]
            if len(page) < 7:
                break
        assert pages == full

    def test_after_validation(self, sorted_idx):
        with pytest.raises(ValueError):
            sortedindex.search_sorted_early(sorted_idx, ["the"], k=5,
                                            after=-3)


class TestStoredDocValues:
    def test_sorted_index_stores_sort_field(self, spark, docs, sorted_idx):
        """build_sorted stores the sort column in the docs table (doc
        values) — sorted retrieval + sort values need no corpus join."""
        assert "n_chars" in sorted_idx.docs.columns
        got = sorted_idx.docs.select("doc_id", "url", "n_chars").orderBy(
            "doc_id").limit(5).collect()
        by_id = {r["doc_id"]: r["n_chars"]
                 for r in docs.select("doc_id", "n_chars").collect()}
        for r in got:
            assert r["n_chars"] == by_id[int(r["url"])]

    def test_store_cols_on_plain_build(self, spark, docs, tmp_root):
        from fatespark.query import search_sorted_by
        d = str(tmp_root / "dv_idx")
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
            spark, docs, id_col="doc_id", url_col="doc_id",
            text_col="text", build_id="dv", store_cols=["n_chars"])
        idx = SearchIndex(spark, d)
        # field-sorted retrieval straight off the index's own doc store
        out = search_sorted_by(idx, idx.docs, ["the"], "n_chars", k=5,
                               mode="AND", ascending=False).collect()
        ms = {r["doc_id"] for r in idx.matching_docs(["the"]).collect()}
        rows = [(r["n_chars"], r["doc_id"]) for r in docs.collect()
                if r["doc_id"] in ms]
        exp = [d for _, d in sorted(rows, key=lambda t: (-t[0], t[1]))[:5]]
        assert [r["doc_id"] for r in out] == exp

    def test_store_cols_shadow_rejected(self, spark, docs, tmp_root):
        with pytest.raises(ValueError):
            IndexBuilder(str(tmp_root / "dv_bad"),
                         BuildConfig(n_buckets=2)).build(
                spark, docs, id_col="doc_id", url_col="doc_id",
                text_col="text", store_cols=["dl"])
