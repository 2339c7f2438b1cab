"""Round-3 regressions: analyzer-folded boosts, suggest dedup / empty-input
guards, persisted fuzzy-variant probing (both readers), the recency decay
clamp, significant_terms' single postings derivation + analyzer-aware
foreground, and the large-tombstone broadcast path."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.local import LocalSearchIndex
from fatespark.query import SearchIndex, significant_terms
from fatespark.suggest import suggest, write_fuzzy_variants


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def porter_idx(spark, tmp_root):
    """Porter-stemmed index: 'running'/'runs'/'run' all index as 'run'."""
    rows = [(i, f"running fast doc{i:03d}" if i % 2 == 0
             else f"walking slow doc{i:03d}") for i in range(1, 81)]
    pdf = pd.DataFrame(rows, columns=["id", "text"])
    d = str(tmp_root / "r3_porter_idx")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0,
                                analyzer="porter")).build(
        spark, spark.createDataFrame(pdf), id_col="id", url_col="id",
        text_cols=["text"])
    return SearchIndex(spark, d), LocalSearchIndex(d), pdf


@pytest.fixture(scope="module")
def ws_idx(spark, tmp_root):
    """Whitespace index with a spellable vocabulary for fuzzy tests."""
    words = ["batch", "batches", "match", "hatch", "botch", "catch",
             "merge", "merges", "marge", "scan", "scans", "span"]
    rows = [(i, " ".join(words[(i + j) % len(words)] for j in range(6)))
            for i in range(1, 101)]
    pdf = pd.DataFrame(rows, columns=["id", "text"])
    d = str(tmp_root / "r3_ws_idx")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, spark.createDataFrame(pdf), id_col="id", url_col="id",
        text_cols=["text"])
    return SearchIndex(spark, d), d, pdf


class TestBoostThroughAnalyzer:
    def test_porter_boost_key_lands_on_stem(self, porter_idx):
        idx, loc, _ = porter_idx
        plain = idx.search("running", k=5, mode="OR").collect()
        via_raw = idx.search("running", k=5, mode="OR",
                             boosts={"running": 2.0}).collect()
        via_stem = idx.search("running", k=5, mode="OR",
                              boosts={"run": 2.0}).collect()
        assert plain, "query should match"
        # the raw-form key must not silently no-op: it folds to 'run',
        # exactly like the stem key, and doubles every score
        assert [(r["doc_id"], r["score"]) for r in via_raw] == \
               [(r["doc_id"], r["score"]) for r in via_stem]
        assert all(abs(b["score"] - 2.0 * p["score"]) < 1e-12
                   for b, p in zip(via_raw, plain))

    def test_local_reader_parity(self, porter_idx):
        idx, loc, _ = porter_idx
        got = loc.search("running", k=5, mode="OR",
                         boosts={"running": 2.0})
        want = idx.search("running", k=5, mode="OR",
                          boosts={"running": 2.0}).collect()
        assert [(int(d), float(s)) for d, s in
                zip(got["doc_id"], got["score"])] == \
               [(r["doc_id"], r["score"]) for r in want]


class TestSuggestGuards:
    def test_empty_qterms_returns_empty(self, ws_idx):
        idx, _, _ = ws_idx
        out = suggest(idx, [], k=5)
        assert out.count() == 0
        assert out.columns == ["qterm", "suggestion", "dist", "df", "rank"]
        out2 = suggest(idx, ["", ""], k=5)
        assert out2.count() == 0

    def test_multifield_suggestions_unique(self, spark, tmp_root):
        # 'batch' lives in BOTH fields with different per-field dfs: the
        # (term, field) dictionary rows must collapse to ONE suggestion
        rows = [(i, "batch merge", "batch" if i % 3 == 0 else "scan")
                for i in range(1, 61)]
        pdf = pd.DataFrame(rows, columns=["id", "body", "tag"])
        d = str(tmp_root / "r3_mf_suggest")
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
            spark, spark.createDataFrame(pdf), id_col="id", url_col="id",
            text_cols=["body", "tag"])
        idx = SearchIndex(spark, d)
        got = suggest(idx, ["batck"], k=5, max_edit=1).collect()
        names = [r["suggestion"] for r in got]
        assert len(names) == len(set(names)), f"duplicate suggestions {names}"
        batch = [r for r in got if r["suggestion"] == "batch"]
        assert batch and batch[0]["df"] == 60  # max over per-field dfs


class TestPersistedFuzzyVariants:
    def test_probe_equals_inline_expansion(self, ws_idx):
        idx, d, _ = ws_idx
        inline1 = idx.expand_fuzzy("batchh", max_edit=1)  # d1 of 'batch'
        inline2 = idx.expand_fuzzy("batk", max_edit=2)    # d2 of 'batch'
        assert "batch" in inline1 and "batch" in inline2
        write_fuzzy_variants(idx, depth=2, n_buckets=16)
        idx2 = SearchIndex(idx.spark, d)  # fresh reader, auto-discovers
        assert idx2.expand_fuzzy("batchh", max_edit=1) == inline1
        assert idx2.expand_fuzzy("batk", max_edit=2) == inline2

    def test_probe_plan_prunes_not_expands(self, ws_idx):
        idx, d, _ = ws_idx
        write_fuzzy_variants(idx, depth=2, n_buckets=16)
        idx2 = SearchIndex(idx.spark, d)
        df = suggest(idx2, ["batk"], k=5, max_edit=2, depth=2)
        plan = _plan(df)
        # physical partition pruning on the bucket key, and NO inline
        # vocabulary expansion expression anywhere in the plan
        assert "vbucket" in plan
        assert "array_distinct" not in plan
        got = {r["suggestion"] for r in df.collect()}
        assert "batch" in got

    def test_local_reader_probes_and_matches(self, ws_idx):
        idx, d, _ = ws_idx
        write_fuzzy_variants(idx, depth=2, n_buckets=16)
        loc = LocalSearchIndex(d)
        got = loc.expand_fuzzy("batk", max_edit=2)
        assert loc._fuzzy_local is not None and loc._fuzzy_local[0] is not None
        idx2 = SearchIndex(idx.spark, d)
        assert got == idx2.expand_fuzzy("batk", max_edit=2)

    def test_shallow_table_refuses_deeper_request(self, spark, tmp_root):
        rows = [(i, "batch merge scan") for i in range(1, 31)]
        d = str(tmp_root / "r3_shallow_fuzzy")
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
            spark, spark.createDataFrame(
                pd.DataFrame(rows, columns=["id", "text"])),
            id_col="id", url_col="id", text_cols=["text"])
        idx = SearchIndex(spark, d)
        write_fuzzy_variants(idx, depth=1, n_buckets=8)
        idx2 = SearchIndex(spark, d)
        # depth-1 table cannot serve a complete distance-2 request: the
        # reader must fall back to the inline depth-2 expansion, keeping
        # the result complete (here: 'bxtch' is distance 2 from 'batch')
        assert "batch" in idx2.expand_fuzzy("bxtch", max_edit=2)
        loc = LocalSearchIndex(d)
        assert "batch" in loc.expand_fuzzy("bxtch", max_edit=2)


class TestRecencyClamp:
    def test_future_timestamp_decay_capped_at_one(self, ws_idx, spark):
        from fatespark.rescore import recency_topk
        idx, _, pdf = ws_idx
        now = 1_700_000_000
        # doc 1 has a FUTURE timestamp; its decay must clamp to 1.0, not
        # exceed it (the window-exactness invariant decay <= 1)
        meta = spark.createDataFrame(
            [(int(i), now + 864000 if i == 1 else now - int(i) * 86400)
             for i in pdf["id"]], "doc_id long, ts long")
        base = {r["doc_id"]: r["score"]
                for r in idx.search("batch", k=200, mode="OR").collect()}
        got = recency_topk(idx, meta, "batch", k=200, pool=200,
                           ts_col="ts", now_ts=now, half_life_days=30.0)
        for r in got.collect():
            assert r["score"] <= base[r["doc_id"]] + 1e-12
            if r["doc_id"] == 1:
                assert r["score"] == pytest.approx(base[1])


class TestSignificantTerms:
    def test_single_postings_derivation(self, ws_idx, spark):
        idx, _, pdf = ws_idx
        corpus = spark.createDataFrame(pdf).withColumnRenamed("id", "doc_id")
        out = significant_terms(idx, corpus, "batch", k=10)
        # matched set is checkpointed: the returned plan re-reads the
        # materialized RDD, never the postings parquet a second time
        assert "postings" not in _plan(out)
        assert out.count() > 0

    def test_porter_foreground_uses_index_analyzer(self, porter_idx, spark):
        idx, _, pdf = porter_idx
        corpus = spark.createDataFrame(pdf).withColumnRenamed("id", "doc_id")
        got = significant_terms(idx, corpus, "running", k=100, min_fg=1)
        rows = {r["term"]: r for r in got.collect()}
        # foreground tokens are stemmed like the dictionary: 'run' joins,
        # raw 'running' never appears
        assert "run" in rows and "running" not in rows
        assert rows["run"]["fg_df"] == 40  # every even doc matches


class TestTombstoneBroadcast:
    def test_large_delete_set_broadcasts_and_filters(self, spark, tmp_root):
        from fatespark.query import TOMBSTONE_BROADCAST_ROWS
        rows = [(i, f"alpha beta doc{i:03d}") for i in range(1, 201)]
        d = str(tmp_root / "r3_tomb_bc")
        b = IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0))
        b.build(spark, spark.createDataFrame(
            pd.DataFrame(rows, columns=["id", "text"])),
            id_col="id", url_col="id", text_cols=["text"])
        # delete every even doc plus a large synthetic id range so the
        # tombstone set crosses the broadcast threshold
        victims = list(range(2, 201, 2)) + list(
            range(1_000_000, 1_000_000 + TOMBSTONE_BROADCAST_ROWS + 5_000))
        b.delete_docs(spark, victims)
        idx = SearchIndex(spark, d)
        assert idx.tombstones.size > TOMBSTONE_BROADCAST_ROWS
        got = idx.search("alpha", k=250, mode="OR").collect()
        assert idx._tomb_bc is not None, "large set must go via broadcast"
        ids = {r["doc_id"] for r in got}
        assert ids == {i for i in range(1, 201) if i % 2 == 1}
        # unscored paths share the handle
        assert idx.matching_docs("alpha").count() == 100
