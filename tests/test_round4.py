"""Round-4 additions: transposed-vectorized segmented fold (bit parity
with the per-row loop it replaced), DSIR broadcast-model path, tombstone-
consistent CharIndex.find, and BM25 stats rebasing for filtered search."""

import numpy as np
import pandas as pd
import pytest

from fatespark.textops import _segmented_fold


def _reference_fold(id_col, nt_in, nt_out, out_col, mul):
    """The round-3 per-row kernel, kept verbatim as the parity oracle."""

    def fold(batches):
        cur = None
        acc = 0.0
        nt = 0
        ids, nts, surs = [], [], []

        def flush():
            out = pd.DataFrame({
                id_col: pd.array(ids, dtype="int64"),
                nt_out: pd.array(nts, dtype="int64"),
                out_col: pd.array(surs, dtype="float64")})
            ids.clear()
            nts.clear()
            surs.clear()
            return out

        for pdf in batches:
            dv = pdf[id_col].to_numpy()
            sv = pdf["s"].to_numpy()
            nv = pdf[nt_in].to_numpy()
            for i in range(len(dv)):
                d = dv[i]
                if d != cur:
                    if cur is not None:
                        ids.append(cur)
                        nts.append(nt)
                        surs.append(np.floor(acc / nt * mul) / mul)
                    cur = d
                    acc = 0.0
                    nt = int(nv[i])
                acc += sv[i]
            if len(ids) >= 50_000:
                yield flush()
        if cur is not None:
            ids.append(cur)
            nts.append(nt)
            surs.append(np.floor(acc / nt * mul) / mul)
        yield flush()

    return fold


def _run(kernel, batches):
    frames = list(kernel(iter(batches)))
    return pd.concat(frames, ignore_index=True)


class TestSegmentedFoldParity:
    def _random_batches(self, rng, n_docs, max_len, n_splits):
        ids, ss, nts = [], [], []
        for d in range(n_docs):
            ln = int(rng.integers(1, max_len))
            ids += [d * 7 + 3] * ln
            nts += [ln * 2 + 1] * ln
            # wide magnitude spread: rounding-order differences WILL show
            ss += list((rng.random(ln) - 0.5) * np.exp(rng.normal(0, 18, ln)))
        df = pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"),
                           "ntok": pd.array(nts, dtype="int64"),
                           "s": pd.array(ss, dtype="float64")})
        # split at arbitrary points so runs span Arrow-batch boundaries
        cuts = sorted(rng.integers(0, len(df) + 1, size=n_splits).tolist())
        bounds = [0] + cuts + [len(df)]
        return [df.iloc[a:b] for a, b in zip(bounds, bounds[1:])]

    def test_bit_identical_to_per_row_loop(self):
        rng = np.random.default_rng(1234)
        for trial in range(25):
            batches = self._random_batches(
                rng, n_docs=int(rng.integers(1, 40)),
                max_len=int(rng.integers(2, 300)),
                n_splits=int(rng.integers(0, 6)))
            vec = _run(_segmented_fold("doc_id", "ntok", "ntok", "surprisal",
                                       1e4), batches)
            ref = _run(_reference_fold("doc_id", "ntok", "ntok", "surprisal",
                                       1e4), batches)
            pd.testing.assert_frame_equal(vec, ref, check_exact=True)

    def test_adversarial_cancellation(self):
        # the case that distinguishes sequential from pairwise summation:
        # np.add.reduceat gives 1024.0 here, a sequential fold gives 1.0
        s = np.array([1e16, 1.0, -1e16, 1.0] * 400)
        df = pd.DataFrame({"doc_id": pd.array([5] * len(s), dtype="int64"),
                           "ntok": pd.array([1] * len(s), dtype="int64"),
                           "s": s})
        vec = _run(_segmented_fold("doc_id", "ntok", "ntok", "x", 1e4),
                   [df.iloc[:700], df.iloc[700:]])
        acc = 0.0
        for v in s:
            acc += v
        assert vec["x"].tolist() == [np.floor(acc / 1 * 1e4) / 1e4]

    def test_empty_and_single_row_batches(self):
        df = pd.DataFrame({"doc_id": pd.array([1, 1, 2], dtype="int64"),
                           "ntok": pd.array([2, 2, 1], dtype="int64"),
                           "s": pd.array([0.5, 0.25, -3.0], dtype="float64")})
        batches = [df.iloc[0:0], df.iloc[0:1], df.iloc[0:0], df.iloc[1:2],
                   df.iloc[2:3], df.iloc[0:0]]
        vec = _run(_segmented_fold("doc_id", "ntok", "ntok", "x", 1e4),
                   batches)
        ref = _run(_reference_fold("doc_id", "ntok", "ntok", "x", 1e4),
                   [df])
        pd.testing.assert_frame_equal(vec, ref, check_exact=True)


class TestDsirBroadcastModel:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        from pyspark.sql import functions as F
        from fatespark.corpus import pages_pandas
        pdf = pages_pandas(np.arange(120))
        pdf["lang"] = ["en" if i % 3 else "ru" for i in range(120)]
        return (spark.createDataFrame(pdf[["url", "text", "lang"]])
                .withColumn("doc_id", F.xxhash64("url"))
                .repartition(4))

    def test_bit_parity_with_literal_path(self, spark, docs):
        from pyspark.sql import functions as F
        from fatespark import dsir
        tgt = F.col("lang") == "en"
        lit = {r["doc_id"]: (r["n_grams"], r["logw"]) for r in
               dsir.dsir_logweights(docs, tgt, m=4096,
                                    broadcast_model=False).collect()}
        bc = {r["doc_id"]: (r["n_grams"], r["logw"]) for r in
              dsir.dsir_logweights(docs, tgt, m=4096,
                                   broadcast_model=True).collect()}
        assert lit == bc and len(lit) == 120

    def test_large_m_auto_broadcast_no_plan_blowup(self, spark, docs):
        from pyspark.sql import functions as F
        from fatespark import dsir
        # m = 1e5: the literal path would inline 100k doubles into the
        # plan; auto mode must pick the broadcast join instead
        out = dsir.dsir_logweights(docs, F.col("lang") == "en", m=100_000)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # corpus side never wide-shuffles: the only Exchange allowed is
        # the broadcast one
        import re
        assert not re.search(r"Exchange (hash|range)partitioning", plan)
        assert out.count() == 120


class TestCharIndexTombstones:
    def test_find_respects_delete_lifecycle(self, spark, tmp_root):
        from pyspark.sql import functions as F
        from fatespark import charindex
        from fatespark.corpus import pages_pandas

        pdf = pages_pandas(np.arange(80))
        docs = (spark.createDataFrame(pdf[["url", "text"]])
                .withColumn("doc_id", F.xxhash64("url"))
                .select("doc_id", "text"))
        d = str(tmp_root / "charidx_tomb")
        idx = charindex.CharIndex.build(docs, d, k=8, n_buckets=8)

        # pick victims that actually match both a short and a long pattern
        short_pat, long_pat = "search", "the term0"
        hit_ids = sorted({r["doc_id"] for r in
                          idx.find(spark, docs, short_pat).collect()})
        assert len(hit_ids) >= 3, "fixture must produce matches"
        dead = hit_ids[:2]

        survivors = docs.filter(~F.col("doc_id").isin(dead))
        rebuilt = charindex.CharIndex.build(
            survivors, str(tmp_root / "charidx_rebuilt"), k=8, n_buckets=8)

        for pat in (short_pat, long_pat, "a"):
            masked = sorted(map(tuple, idx.find(
                spark, docs, pat, tombstones=np.array(dead)).collect()))
            fresh = sorted(map(tuple, rebuilt.find(
                spark, survivors, pat).collect()))
            assert masked == fresh, pat
            # and the un-masked probe still returns the dead docs
            if pat == short_pat:
                full = {r["doc_id"] for r in
                        idx.find(spark, docs, pat).collect()}
                assert set(dead) <= full

    def test_find_accepts_search_index_handle(self, spark, tmp_root):
        """An index with pending deletes passes straight through."""
        from pyspark.sql import functions as F
        from fatespark import charindex
        from fatespark.build import BuildConfig, IndexBuilder
        from fatespark.corpus import pages_pandas
        from fatespark.query import SearchIndex

        pdf = pages_pandas(np.arange(40))
        docs = (spark.createDataFrame(pdf[["url", "text"]])
                .withColumn("doc_id",
                            F.monotonically_increasing_id() + 1)
                .select("doc_id", "url", "text"))
        idir = str(tmp_root / "tombidx")
        b = IndexBuilder(idir, BuildConfig(n_buckets=4))
        b.build(spark, docs)
        victims = [int(r["doc_id"]) for r in docs.limit(2).collect()]
        b.delete_docs(spark, victims)
        si = SearchIndex(spark, idir)
        assert si.tombstones is not None

        d = str(tmp_root / "charidx_si")
        cidx = charindex.CharIndex.build(docs, d, k=8, n_buckets=8)
        got = {r["doc_id"] for r in
               cidx.find(spark, docs, "a", tombstones=si).collect()}
        assert not (got & set(victims)) and got


class TestRebaseStats:
    @pytest.fixture(scope="class")
    def fixture(self, spark, tmp_root):
        from pyspark.sql import functions as F
        from fatespark.build import BuildConfig, IndexBuilder
        from fatespark.corpus import pages_pandas
        from fatespark.query import SearchIndex

        pdf = pages_pandas(np.arange(150))
        pdf["source"] = [f"src{i % 4}" for i in range(150)]
        docs = (spark.createDataFrame(pdf[["url", "text", "source"]])
                .withColumn("doc_id", F.xxhash64("url"))
                .select("doc_id", "url", "text", "source"))
        full_dir = str(tmp_root / "rb_full")
        IndexBuilder(full_dir, BuildConfig(n_buckets=4, salt_bits=0)).build(
            spark, docs, id_col="doc_id", url_col="url",
            text_cols=["text", "source"], build_id="rb-full")
        sub = docs.filter(F.col("source") == "src2")
        sub_dir = str(tmp_root / "rb_sub")
        IndexBuilder(sub_dir, BuildConfig(n_buckets=4, salt_bits=0)).build(
            spark, sub, id_col="doc_id", url_col="url",
            text_cols=["text", "source"], build_id="rb-sub")
        return (SearchIndex(spark, full_dir), SearchIndex(spark, sub_dir))

    def _rows(self, df):
        return [(r["doc_id"], r["score"]) for r in df.collect()]

    def test_rebased_equals_subset_built_index(self, fixture):
        full, sub = fixture
        for query, mode in [("search", "OR"), (["term00001", "the"], "OR"),
                            (["term00001", "the"], "AND")]:
            a = self._rows(full.search(
                query, k=10, mode=mode, weights=[1.0, 0.0],
                filter_terms=["src2"], filter_field=1, rebase_stats=True))
            b = self._rows(sub.search(
                query, k=10, mode=mode, weights=[1.0, 0.0]))
            assert a == b, (query, mode)   # bit-exact scores AND order

    def test_default_path_unchanged_and_scores_differ(self, fixture):
        full, sub = fixture
        stale = self._rows(full.search(
            "search", k=10, mode="OR", weights=[1.0, 0.0],
            filter_terms=["src2"], filter_field=1))
        rebased = self._rows(full.search(
            "search", k=10, mode="OR", weights=[1.0, 0.0],
            filter_terms=["src2"], filter_field=1, rebase_stats=True))
        # same candidate universe ...
        assert {d for d, _ in stale} == {d for d, _ in rebased}
        # ... but rebased idf/avgdl move the scores
        assert stale != rebased

    def test_rebase_requires_filter(self, fixture):
        full, _ = fixture
        with pytest.raises(ValueError):
            full.search("search", k=5, rebase_stats=True)

    def test_empty_subset_returns_empty(self, fixture):
        full, _ = fixture
        # filter term absent from the dictionary -> empty result, no error
        out = full.search("search", k=5, filter_terms=["srcNOPE"],
                          filter_field=1, rebase_stats=True)
        assert out.count() == 0


class TestC4Filters:
    """C4 cleaning rules (Raffel et al. 2020 §2.2): line retention,
    sentence minimum, page-level lorem/brace/badword verdicts."""

    def _run(self, spark, rows, **kw):
        from fatespark.textops import c4_filters_df
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = c4_filters_df(df, **kw).collect()
        return {r["doc_id"]: r for r in out}

    def test_line_rules(self, spark):
        txt = ("Good first sentence here.\n"      # kept
               "no terminal punctuation\n"        # dropped: no punct
               "Too short.\n"                     # dropped: 2 words
               "  Ends with a question mark?  \n" # kept (trimmed)
               "Uses javascript on this line.\n"  # dropped: javascript
               'He said "stop right there."')     # kept: ends with quote?
        r = self._run(spark, [(1, txt)])[1]
        assert r["c4_kept_lines"] == 3
        assert r["c4_text"].splitlines() == [
            "Good first sentence here.",
            "Ends with a question mark?",
            'He said "stop right there."']
        # sentences: 1 '.' + 1 '?' + 2 '.' inside/terminal of the quote line
        assert r["c4_n_sentences"] == 3
        assert not r["c4_has_lorem"] and not r["c4_has_brace"]
        assert r["c4_badword_count"] == 0
        assert not r["c4_keep"]  # only 3 sentences < 5

    def test_keep_verdict_and_page_rules(self, spark):
        good = "This sentence has enough words.\n" * 6
        rows = [(1, good),
                (2, good + "Lorem Ipsum dolor."),
                (3, good + "code { inside }"),
                (4, good + "A bad badword2 here.")]
        out = self._run(spark, rows, badwords=["badword1", "badword2"])
        assert out[1]["c4_keep"] is True
        assert out[2]["c4_has_lorem"] and not out[2]["c4_keep"]
        assert out[3]["c4_has_brace"] and not out[3]["c4_keep"]
        assert out[4]["c4_badword_count"] == 1 and not out[4]["c4_keep"]

    def test_badword_word_granularity(self, spark):
        # 'assess' must not trip 'ass'; punctuation-adjacent match must
        out = self._run(spark, [(1, "We assess the ass, carefully.\n" * 5)],
                        badwords=["ass"])
        assert out[1]["c4_badword_count"] == 5

    def test_null_and_empty(self, spark):
        out = self._run(spark, [(1, None), (2, "")])
        for d in (1, 2):
            assert out[d]["c4_kept_lines"] == 0
            assert out[d]["c4_text"] == ""
            assert not out[d]["c4_keep"]
