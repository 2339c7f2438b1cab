"""End-to-end Spark engine tests: build → query, rank-identical vs the
pure-Python oracle (SURVEY §5: count, AND, OR, phrase, prefix, determinism
across partition counts, WAND == exhaustive, resume)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_df, pages_pandas
from fatespark.oracle import BM25Oracle
from fatespark.query import SearchIndex

N_DOCS = 400


@pytest.fixture(scope="session")
def built(spark, tmp_root):
    """Build the index once; also return the oracle over the same corpus
    keyed by the engine's doc_ids."""
    idx_dir = str(tmp_root / "idx")
    corpus = pages_df(spark, N_DOCS, partitions=8)
    builder = IndexBuilder(idx_dir, BuildConfig(n_buckets=4, salt_bits=1,
                                                block_size=32))
    totals = builder.build(spark, corpus, build_id="t1")
    idx = SearchIndex(spark, idx_dir)
    # oracle with engine doc ids: map url -> xxhash64 doc_id from docs table
    id_rows = idx.docs.select("doc_id", "url").collect()
    url2id = {r["url"]: r["doc_id"] for r in id_rows}
    pdf = pages_pandas(np.arange(N_DOCS, dtype=np.uint64))
    oracle = BM25Oracle([(url2id[u], t) for u, t in zip(pdf["url"], pdf["text"])])
    return idx, oracle, totals


def _got(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


class TestBuild:
    def test_totals(self, built):
        idx, oracle, totals = built
        assert totals["docs"] == N_DOCS
        assert idx.n_docs == N_DOCS

    def test_corpus_stats_match_oracle(self, built):
        idx, oracle, _ = built
        assert idx.n_docs == oracle.n_docs
        assert idx.avgdl == oracle.avgdl  # exact float64

    def test_term_stats_match_oracle(self, built):
        idx, oracle, _ = built
        for t in ["the", "smith", "fat_entry", "Любовная".lower()]:
            assert idx.count(t) == oracle.count(t), t
        assert idx.count("nonexistenttoken") == 0

    def test_cf_matches_oracle(self, built):
        idx, oracle, _ = built
        cf = sum(len(p) for p in oracle.postings.get("the", {}).values())
        assert idx.count_occurrences("the") == cf


QUERIES = [
    ("the", "OR"),                  # head term
    ("smith", "OR"),                # mid term
    ("zyzzyva", "OR"),              # tail term
    ("the smith", "AND"),           # head+mid AND
    ("smith jones", "OR"),          # OR
    ("the smith zyzzyva", "AND"),   # AND with rare term (WAND stressor)
    ("the of and to a in", "OR"),   # many head terms
    ("nosuchterm", "OR"),           # zero-hit
    ("nosuchterm the", "AND"),      # AND with zero-hit member
]


class TestRankIdentical:
    @pytest.mark.parametrize("q,mode", QUERIES)
    def test_topk_matches_oracle(self, built, q, mode):
        idx, oracle, _ = built
        expected = oracle.search(q, k=10, mode=mode)
        got = _got(idx.search(q, k=10, mode=mode))
        assert got == expected, f"{q} {mode}"

    @pytest.mark.parametrize("q,mode", [("the smith", "OR"),
                                        ("smith jones brown", "OR"),
                                        ("the of and to a in", "OR")])
    def test_wand_equals_exhaustive(self, built, q, mode):
        idx, oracle, _ = built
        exh = _got(idx.search(q, k=10, mode=mode, use_wand=False))
        wand = _got(idx.search(q, k=10, mode=mode, use_wand=True))
        assert wand == exh
        assert wand == oracle.search(q, k=10, mode=mode)

    def test_pagination(self, built):
        idx, oracle, _ = built
        full = oracle.search("smith", k=20, mode="OR")
        assert _got(idx.search("smith", k=5, mode="OR", offset=5)) == full[5:10]

    def test_phrase(self, built):
        idx, oracle, _ = built
        expected = oracle.search_phrase("the the", k=10)
        got = _got(idx.search_phrase("the the", k=10))
        assert got == expected

    def test_prefix(self, built):
        idx, oracle, _ = built
        assert idx.expand_prefix("fa") == oracle.expand_prefix("fa")
        assert _got(idx.search_prefix("fa", k=10)) == oracle.search_prefix("fa", k=10)

    def test_with_url(self, built):
        idx, oracle, _ = built
        rows = idx.search("smith", k=3, mode="OR", with_url=True).collect()
        assert all(r["url"].startswith("https://example-") for r in rows)


class TestDeterminism:
    def test_partition_count_invariance(self, spark, tmp_root, built):
        """Same corpus at a different partitioning → byte-identical results
        (the Spark-native analogue of fragment-order independence)."""
        idx1, oracle, _ = built
        idx_dir = str(tmp_root / "idx_p2")
        corpus = pages_df(spark, N_DOCS, partitions=2)
        IndexBuilder(idx_dir, BuildConfig(n_buckets=3, salt_bits=0,
                                          block_size=128)).build(
            spark, corpus, build_id="t2")
        idx2 = SearchIndex(spark, idx_dir)
        for q, mode in [("the smith", "AND"), ("smith jones", "OR")]:
            assert _got(idx1.search(q, mode=mode)) == _got(idx2.search(q, mode=mode))


class TestResume:
    def test_chunked_build_equals_single(self, spark, tmp_root, built):
        idx1, oracle, _ = built
        idx_dir = str(tmp_root / "idx_chunked")
        corpus = pages_df(spark, N_DOCS, partitions=4)
        b = IndexBuilder(idx_dir, BuildConfig(n_buckets=4, salt_bits=1,
                                              block_size=32))
        b.build(spark, corpus, build_id="c1", n_chunks=3)
        idx2 = SearchIndex(spark, idx_dir)
        assert idx2.n_docs == N_DOCS and idx2.avgdl == oracle.avgdl
        for q, mode in [("the smith", "AND"), ("smith", "OR")]:
            assert _got(idx2.search(q, mode=mode)) == oracle.search(q, mode=mode)

    def test_resume_skips_done_chunks(self, spark, tmp_root):
        idx_dir = str(tmp_root / "idx_resume")
        corpus = pages_df(spark, 100, partitions=2)
        b = IndexBuilder(idx_dir, BuildConfig(n_buckets=2, salt_bits=0))
        b.build(spark, corpus, build_id="r1", n_chunks=2)
        # resuming the same build: all chunks already done
        totals = b.build(spark, corpus, build_id="r1", n_chunks=2, resume=True)
        assert totals["chunks_skipped"] == 2
        assert totals["docs"] == 0  # nothing rebuilt
        idx = SearchIndex(spark, idx_dir)
        assert idx.n_docs == 100

    def test_duplicate_doc_detection(self, spark, tmp_root):
        idx_dir = str(tmp_root / "idx_dup")
        corpus = pages_df(spark, 50, partitions=2)
        dup = corpus.union(corpus.limit(5))
        b = IndexBuilder(idx_dir, BuildConfig(n_buckets=2, salt_bits=0))
        with pytest.raises(Exception, match="duplicate doc_ids"):
            b.build(spark, dup, build_id="d1")


class TestPlanShape:
    def test_term_filter_pushed_to_scan(self, built):
        idx, _, _ = built
        plan = (idx.postings.filter(F.col("term").isin(["the", "smith"]))
                ._jdf.queryExecution().executedPlan().toString())
        assert "PushedFilters" in plan and "term" in plan


class TestFindAll:
    """Per-hit enumeration (reference Hits/Hit granularity,
    lib/suffix_array_reader.rb:45-72): every (doc, position) for each term,
    straight from the index's position lists."""

    def test_hits_match_oracle_positions(self, built):
        idx, oracle, _ = built
        hits = idx.find_all(["the", "smith"]).collect()
        got = {}
        for r in hits:
            got.setdefault(r["term"], {}).setdefault(
                r["doc_id"], []).append(r["position"])
        for t in ["the", "smith"]:
            want = {d: sorted(ps)
                    for d, ps in oracle.postings.get(t, {}).items()}
            assert {d: sorted(ps) for d, ps in got.get(t, {}).items()} \
                == want, t

    def test_local_parity(self, built, tmp_root):
        from fatespark.local import LocalSearchIndex
        idx, _, _ = built
        loc = LocalSearchIndex(str(tmp_root / "idx"))
        a = sorted((r["doc_id"], r["field"], r["position"], r["term"])
                   for r in idx.find_all(["the", "smith"]).collect())
        b = list(loc.find_all(["the", "smith"])[
            ["doc_id", "field", "position", "term"]].itertuples(
                index=False, name=None))
        assert a == sorted(b) and len(a) == len(b)

    def test_contexts_token_window(self, spark, built):
        from fatespark.query import hit_contexts
        idx, _, _ = built
        corpus = pages_df(spark, N_DOCS, partitions=4)
        docs_keyed = idx.docs.select("doc_id", "url").join(
            corpus.withColumnRenamed("url", "url"), "url").select(
            "doc_id", "text")
        hits = idx.find_all("smith").limit(50)
        ctx = hit_contexts(hits, docs_keyed, size=2).collect()
        assert ctx
        for r in ctx:
            toks = r["context"].split(" ")
            assert any(w.lower() == "smith" for w in toks), r["context"]
            assert len(toks) <= 5  # pos +/- 2 tokens

    def test_missing_term_empty(self, built):
        idx, _, _ = built
        assert idx.find_all("zzz_not_there").count() == 0


class TestExclusion:
    """search(exclude=[...]): NOT-terms drop docs BEFORE per-bucket top-k,
    so ranks back-fill — checked against the pure-Python oracle filtered on
    its own postings."""

    def _expected(self, oracle, q, mode, exclude, k=10):
        banned = set()
        for t in exclude:
            banned |= set(oracle.postings.get(t, {}))
        full = oracle.search(q, k=oracle.n_docs, mode=mode)
        return [r for r in full if r[0] not in banned][:k]

    @pytest.mark.parametrize("q,mode,ex", [
        ("the smith", "OR", ["jones"]),
        ("smith jones", "AND", ["the"]),
        ("smith", "OR", ["smith"]),          # self-exclusion -> empty
        ("the of and", "OR", ["smith", "brown"]),
    ])
    def test_matches_filtered_oracle(self, built, q, mode, ex):
        idx, oracle, _ = built
        got = _got(idx.search(q, k=10, mode=mode, exclude=ex))
        assert got == self._expected(oracle, q, mode, ex)

    def test_backfill_still_fills_k(self, built):
        idx, oracle, _ = built
        got = _got(idx.search("the", k=10, mode="OR", exclude=["smith"]))
        banned = set(oracle.postings.get("smith", {}))
        assert len(got) == 10
        assert not banned & {d for d, _ in got}
        # and these are NOT simply the unexcluded prefix of the plain top-10
        plain = _got(idx.search("the", k=10, mode="OR"))
        assert got != plain

    def test_missing_exclude_term_is_noop(self, built):
        idx, _, _ = built
        a = _got(idx.search("the smith", k=10, mode="OR"))
        b = _got(idx.search("the smith", k=10, mode="OR",
                            exclude=["zzz_not_in_corpus"]))
        assert a == b

    def test_wand_path_with_exclusion(self, built):
        idx, oracle, _ = built
        q, ex = "the of smith", ["jones"]
        exh = _got(idx.search(q, k=10, mode="OR", exclude=ex,
                              use_wand=False))
        wand = _got(idx.search(q, k=10, mode="OR", exclude=ex,
                               use_wand=True))
        assert wand == exh == self._expected(oracle, q, "OR", ex)

    def test_local_reader_parity(self, built, tmp_root):
        from fatespark.local import LocalSearchIndex
        idx, _, _ = built
        loc = LocalSearchIndex(str(tmp_root / "idx"))
        q, ex = ["the", "smith"], ["jones", "brown"]
        a = _got(idx.search(q, k=10, mode="OR", exclude=ex))
        b = [(int(r.doc_id), float(r.score)) for r in
             loc.search(q, k=10, mode="OR", exclude=ex).itertuples()]
        assert a == b


class TestMatchingDocs:
    """Unscored boolean match sets + facet counts (query.matching_docs /
    facet_counts) against the pure-Python oracle's posting doc sets."""

    def _oracle_docs(self, oracle, terms, mode):
        sets = [set(oracle.postings.get(t, {})) for t in terms]
        if mode == "AND":
            out = set.intersection(*sets) if all(sets) else set()
        else:
            out = set.union(*sets)
        return sorted(out)

    def test_or_matches_oracle(self, built):
        idx, oracle, _ = built
        got = sorted(r["doc_id"] for r in
                     idx.matching_docs(["the", "smith"], "OR").collect())
        assert got == self._oracle_docs(oracle, ["the", "smith"], "OR")

    def test_and_matches_oracle(self, built):
        idx, oracle, _ = built
        got = sorted(r["doc_id"] for r in
                     idx.matching_docs(["the", "smith"], "AND").collect())
        assert got == self._oracle_docs(oracle, ["the", "smith"], "AND")

    def test_and_with_absent_term_is_empty(self, built):
        idx, _, _ = built
        assert idx.matching_docs(["the", "nosuchterm"], "AND").count() == 0

    def test_no_terms_is_empty(self, built):
        idx, _, _ = built
        assert idx.matching_docs([], "OR").count() == 0

    def test_facet_counts(self, built, spark):
        from fatespark.query import facet_counts
        idx, oracle, _ = built
        corpus = idx.docs.select("doc_id").withColumn(
            "grp", F.pmod(F.col("doc_id"), F.lit(3)).cast("int"))
        got = {r["grp"]: r["n_docs"] for r in
               facet_counts(idx, corpus, ["the", "smith"], ["grp"],
                            mode="OR").collect()}
        exp_docs = self._oracle_docs(oracle, ["the", "smith"], "OR")
        exp = {}
        for d in exp_docs:
            exp[d % 3] = exp.get(d % 3, 0) + 1
        assert got == exp

    def test_facet_stats(self, built, spark):
        from fatespark.query import facet_stats
        idx, oracle, _ = built
        corpus = idx.docs.select("doc_id").withColumn(
            "grp", F.pmod(F.col("doc_id"), F.lit(2)).cast("int")).withColumn(
            "val", (F.pmod(F.col("doc_id"), F.lit(101)) * 7 % 101)
            .cast("long"))
        rows = {r["grp"]: r for r in
                facet_stats(idx, corpus, ["the", "smith"], "val", ["grp"],
                            mode="OR").collect()}
        exp_docs = self._oracle_docs(oracle, ["the", "smith"], "OR")
        for g in set(d % 2 for d in exp_docs):
            vals = [d % 101 * 7 % 101 for d in exp_docs if d % 2 == g]
            r = rows[g]
            assert (r["n_docs"], r["min_v"], r["max_v"], r["sum_v"]) == (
                len(vals), min(vals), max(vals), sum(vals))
            assert r["avg_v"] == float(sum(vals)) / len(vals)
        # global (no facet): one row over all matches
        allv = [d % 101 * 7 % 101 for d in exp_docs]
        g0 = facet_stats(idx, corpus, ["the", "smith"], "val",
                         mode="OR").collect()[0]
        assert g0["n_docs"] == len(allv) and g0["sum_v"] == sum(allv)


class TestTermVectors:
    def test_matches_hand_tokenization(self, spark):
        from fatespark.query import term_vectors
        corpus = spark.createDataFrame(
            [(1, "The cat saw the CAT sit"), (2, "  lone  "), (3, None),
             (4, "x y x y x")],
            "doc_id long, text string")
        rows = {(r["doc_id"], r["term"]): (r["tf"], r["positions"]) for r in
                term_vectors(corpus).collect()}
        assert rows[(1, "the")] == (2, "0,3")
        assert rows[(1, "cat")] == (2, "1,4")
        assert rows[(1, "sit")] == (1, "5")
        assert rows[(2, "lone")] == (1, "0")
        assert rows[(4, "x")] == (3, "0,2,4")
        assert rows[(4, "y")] == (2, "1,3")
        assert not any(d == 3 for d, _ in rows)  # NULL text -> no rows

    def test_doc_ids_filter(self, spark):
        from fatespark.query import term_vectors
        corpus = spark.createDataFrame(
            [(i, f"tok{i}") for i in range(10)], "doc_id long, text string")
        got = sorted(r["doc_id"] for r in
                     term_vectors(corpus, doc_ids=[2, 5]).collect())
        assert got == [2, 5]


class TestExplain:
    def test_contributions_fold_to_search_score(self, built):
        """Folding explain() contributions in ascending (term, field) order
        must reproduce search()'s float64 score BIT-FOR-BIT, and tf/df must
        match the pure-Python oracle's postings."""
        idx, oracle, _ = built
        q = ["the", "smith"]
        top = {int(r["doc_id"]): float(r["score"]) for r in
               idx.search(q, k=10, mode="OR").collect()}
        rows = idx.explain(q, k=10, mode="OR").collect()
        per: dict[int, float] = {}
        for r in sorted(rows, key=lambda r: (r["doc_id"], r["term"],
                                             r["field"])):
            per[r["doc_id"]] = per.get(r["doc_id"], 0.0) + r["contribution"]
        assert set(per) == set(top)
        for d, s in top.items():
            assert per[d] == s, d
        for r in rows:
            assert r["tf"] == len(oracle.postings[r["term"]][r["doc_id"]])
            assert r["df"] == len(oracle.postings[r["term"]])

    def test_unknown_terms_empty(self, built):
        idx, _, _ = built
        assert idx.explain(["zzznope"], k=5).count() == 0


class TestSignificantTerms:
    def test_matches_brute_force(self, spark, built):
        import math

        from fatespark.query import significant_terms
        idx, oracle, _ = built
        corpus = pages_df(spark, N_DOCS, partitions=4).withColumn(
            "doc_id", F.xxhash64("url"))
        q = ["the", "smith"]
        got = [(r["term"], r["fg_df"], r["bg_df"], r["lift"]) for r in
               significant_terms(idx, corpus, q, k=15, min_fg=3,
                                 mode="OR").collect()]
        matched = set().union(*(set(oracle.postings.get(t, {}))
                                for t in q))
        n_fg, n_bg = len(matched), oracle.n_docs
        cand = []
        for t, posts in oracle.postings.items():
            fg = len(set(posts) & matched)
            if fg < 3:
                continue
            bg = len(posts)
            lift = math.floor(fg * float(n_bg) / (bg * float(n_fg))
                              * 10000.0) / 10000.0
            cand.append((t, fg, bg, lift))
        cand.sort(key=lambda x: (-x[3], x[0]))
        assert got == cand[:15]

    def test_no_matches_empty(self, built):
        from fatespark.query import significant_terms
        idx, _, _ = built
        corpus = idx.docs.select("doc_id").withColumn("text", F.lit("x"))
        assert significant_terms(idx, corpus, ["zzznope"], k=5).count() == 0
