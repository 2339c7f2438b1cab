"""Regressions for review findings: tombstone-consistent counts, uncapped
single-token prefix counts, weighted phrase scoring parity, resume codec
guard, and config-mutation safety."""

import numpy as np
import pandas as pd
import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.local import LocalSearchIndex
from fatespark.query import SearchIndex


@pytest.fixture(scope="module")
def mf_idx(spark, tmp_root):
    """Two-field corpus with real multi-token fields (phrases possible in
    both), ids 1..N."""
    rows = []
    for i in range(1, 121):
        body = f"alpha beta gamma doc{i:03d}" + (" alpha beta" if i % 3 == 0
                                                 else " delta")
        title = f"title{i:03d} alpha" + (" beta" if i % 4 == 0 else "")
        rows.append((i, body, title))
    pdf = pd.DataFrame(rows, columns=["id", "body", "title"])
    d = str(tmp_root / "review_mf_idx")
    sdf = spark.createDataFrame(pdf)
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, sdf, id_col="id", url_col="id", text_cols=["body", "title"])
    return SearchIndex(spark, d), LocalSearchIndex(d), pdf, d


class TestWeightedPhrase:
    def test_zero_weight_field_excluded(self, mf_idx):
        idx, loc, pdf, _ = mf_idx
        # 'alpha beta' occurs in body (i%3==0 twice, else once at start)
        # and in title for i%4==0
        only_body = idx.search_phrase("alpha beta", k=200,
                                      weights=[1.0, 0.0]).collect()
        both = idx.search_phrase("alpha beta", k=200).collect()
        title_docs = {int(i) for i in pdf[pdf["id"] % 4 == 0]["id"]}
        body_docs = {r["doc_id"] for r in only_body}
        assert body_docs  # body matches exist
        # title-only contributions are gone: scores differ for title docs
        scores_both = {r["doc_id"]: r["score"] for r in both}
        scores_body = {r["doc_id"]: r["score"] for r in only_body}
        overlap = title_docs & set(scores_both) & set(scores_body)
        assert overlap
        for d in overlap:
            assert scores_body[d] < scores_both[d]

    def test_local_weighted_phrase_parity(self, mf_idx):
        idx, loc, _, _ = mf_idx
        for w in ([1.0, 0.0], [1.0, 3.0], None):
            a = [(r["doc_id"], r["score"]) for r in
                 idx.search_phrase("alpha beta", k=15, weights=w).collect()]
            b = loc.search_phrase("alpha beta", k=15, weights=w)
            assert a == list(zip(b["doc_id"].tolist(),
                                 b["score"].tolist())), w

    def test_zero_weight_only_field_docs_dropped(self, mf_idx):
        """A doc matching the phrase ONLY in a zero-weight field must not
        appear at all (and never with a NULL score) — distributed/local
        parity (ADVICE r01: the when/coalesce chain left NULL scores)."""
        idx, loc, pdf, _ = mf_idx
        # 'title004 alpha' occurs only in the title field of doc 4
        a = idx.search_phrase("title004 alpha", k=10,
                              weights=[1.0, 0.0]).collect()
        assert a == []
        b = loc.search_phrase("title004 alpha", k=10, weights=[1.0, 0.0])
        assert len(b) == 0
        # and no NULL scores leak through on mixed-field matches
        mixed = idx.search_phrase("alpha beta", k=200,
                                  weights=[1.0, 0.0]).collect()
        assert mixed and all(r["score"] is not None for r in mixed)

    def test_search_signature_parity(self, mf_idx):
        """Positional (query, k, mode, offset, use_wand, with_url) must mean
        the same thing on both readers."""
        idx, loc, _, _ = mf_idx
        a = idx.search(["alpha"], 5, "OR", 0, False, True).collect()
        b = loc.search(["alpha"], 5, "OR", 0, False, True)
        assert "url" in b.columns
        assert [(r["doc_id"], r["url"]) for r in a] == \
            list(zip(b["doc_id"].tolist(), b["url"].tolist()))


class TestCountConsistency:
    def test_uncapped_single_token_prefix_count(self, mf_idx):
        idx, loc, pdf, _ = mf_idx
        # 'doc0..' / 'doc1..' / 'title...' families are wide; cap tiny to
        # prove the count ignores it for single tokens
        want = sum(t.startswith("doc") for v in pdf["body"]
                   for t in v.split())
        assert want > 100
        assert idx.count_phrase("doc", prefix=True, max_expansions=2) == want
        assert loc.count_phrase("doc", prefix=True, max_expansions=2) == want
        assert idx.count_prefix("doc") == want == loc.count_prefix("doc")

    def test_count_phrase_respects_tombstones(self, spark, tmp_root, mf_idx):
        _, _, pdf, d = mf_idx
        import shutil
        d2 = str(tmp_root / "review_tomb_idx")
        shutil.rmtree(d2, ignore_errors=True)
        shutil.copytree(d, d2)
        b = IndexBuilder(d2, BuildConfig(n_buckets=2, salt_bits=0))
        victim = 3  # i%3==0 -> body has 'alpha beta' twice, title i%4!=0
        b.delete_docs(spark, [victim])
        idx2 = SearchIndex(spark, d2)
        loc2 = LocalSearchIndex(d2)
        base = SearchIndex(spark, d)
        # multi-token: matcher path (already filtered)
        assert idx2.count_phrase("alpha beta") == \
            base.count_phrase("alpha beta") - 2
        # single-token: must now ALSO exclude the tombstoned doc's tokens
        n_alpha_victim = pdf.loc[pdf["id"] == victim, "body"].iloc[0] \
            .split().count("alpha") + pdf.loc[pdf["id"] == victim,
                                             "title"].iloc[0] \
            .split().count("alpha")
        assert n_alpha_victim == 3
        assert idx2.count_phrase("alpha") == \
            base.count_phrase("alpha") - n_alpha_victim
        assert loc2.count_phrase("alpha") == idx2.count_phrase("alpha")
        # single-token PREFIX counts stay exact under tombstones even with a
        # tiny expansion cap (uncapped expansion feeds the matcher)
        n_doc = sum(t.startswith("doc") for v in pdf["body"]
                    for t in v.split())
        assert idx2.count_phrase("doc", prefix=True,
                                 max_expansions=2) == n_doc - 1
        assert loc2.count_phrase("doc", prefix=True,
                                 max_expansions=2) == n_doc - 1


class TestResumeCodecGuard:
    def test_mixed_codec_resume_refused(self, spark, tmp_root):
        from fatespark.corpus import pages_df
        d = str(tmp_root / "codec_guard_idx")
        corpus = pages_df(spark, 200, partitions=2)
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
            spark, corpus, build_id="g1", n_chunks=2)
        with pytest.raises(ValueError, match="codec"):
            IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0,
                                        codec="pfor")).build(
                spark, corpus, build_id="g1", n_chunks=2, resume=True)


class TestConfigNotMutated:
    def test_fulltext_index_copies_config(self, spark, tmp_root):
        from fatespark.compat import FatesIndex
        from fatespark.corpus import contacts_df
        cfg = BuildConfig(n_buckets=2, salt_bits=0)
        FatesIndex.fulltext_index(
            spark, contacts_df(spark, 300, partitions=2),
            str(tmp_root / "cfg_copy_idx"), ["last_name", "first_name"],
            id_col="id", analyzers=["whitespace", "whitespace"], config=cfg)
        assert cfg.analyzers is None  # caller's object untouched
