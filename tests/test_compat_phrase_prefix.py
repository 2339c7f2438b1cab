"""fates suffix-semantics surface: phrase-prefix matching and the
``FatesIndex`` API veneer, checked against pure-Python token oracles
computed from the same corpus."""

import re

import numpy as np
import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.compat import FatesIndex
from fatespark.corpus import pages_df, pages_pandas
from fatespark.query import SearchIndex

N = 500
_TOKEN = re.compile(r"\S+")


def _phrase_prefix_occurrences(texts, lead: list[str], last_prefix: str) -> int:
    """Oracle: adjacent-token runs where the leading tokens match exactly
    and the final token starts with ``last_prefix`` (case-folded)."""
    n = 0
    L = len(lead)
    for t in texts:
        toks = [x.lower() for x in _TOKEN.findall(t or "")]
        for i in range(len(toks) - L):
            if toks[i:i + L] == lead and toks[i + L].startswith(last_prefix):
                n += 1
    return n


def _prefix_occurrences(texts, prefix: str) -> int:
    n = 0
    for t in texts:
        n += sum(1 for x in _TOKEN.findall(t or "")
                 if x.lower().startswith(prefix))
    return n


@pytest.fixture(scope="module")
def pidx(spark, tmp_root):
    d = str(tmp_root / "phrase_prefix_idx")
    corpus = pages_df(spark, N, partitions=4)
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, corpus, build_id="pp")
    idx = SearchIndex(spark, d)
    texts = list(pages_pandas(np.arange(N, dtype=np.uint64))["text"])
    return idx, texts


class TestCountPhrase:
    def test_exact_phrase_count_matches_oracle(self, pidx):
        idx, texts = pidx
        want_exact = 0
        for t in texts:
            toks = [x.lower() for x in _TOKEN.findall(t or "")]
            want_exact += sum(
                1 for i in range(len(toks) - 1)
                if toks[i] == "the" and toks[i + 1] == "term00003")
        assert want_exact > 0
        assert idx.count_phrase("the term00003") == want_exact

    def test_prefix_phrase_count_matches_oracle(self, pidx):
        """'the term0000' must count every adjacent (the, term0000*) pair —
        the suffix-array semantics of a trailing partial token."""
        idx, texts = pidx
        want = _phrase_prefix_occurrences(texts, ["the"], "term0000")
        got = idx.count_phrase("the term0000", prefix=True,
                               max_expansions=1024)
        assert got == want
        assert want > idx.count_phrase("the term00003")  # strictly wider

    def test_single_token_prefix_count(self, pidx):
        idx, texts = pidx
        for p in ("fa", "sc", "zzznope"):
            assert idx.count_phrase(p, prefix=True, max_expansions=1024) == \
                _prefix_occurrences(texts, p), p

    def test_single_token_exact_count_is_cf(self, pidx):
        idx, _ = pidx
        assert idx.count_phrase("the") == idx.count_occurrences("the")


class TestSearchPhrasePrefix:
    def test_superset_of_exact_phrase_docs(self, pidx):
        idx, _ = pidx
        exact = {r["doc_id"] for r in
                 idx.search_phrase("the term00003", k=500).collect()}
        pref = {r["doc_id"] for r in
                idx.search_phrase_prefix("the term0000", k=500,
                                         max_expansions=1024).collect()}
        assert exact and exact <= pref

    def test_exact_last_token_equals_plain_phrase(self, pidx):
        """When the last token expands only to itself, prefix mode must be
        bit-identical to the exact phrase."""
        idx, _ = pidx
        full = idx.expand_prefix("term00003")
        assert full == ["term00003"]
        a = [(r["doc_id"], r["score"]) for r in
             idx.search_phrase("the term00003", k=20).collect()]
        b = [(r["doc_id"], r["score"]) for r in
             idx.search_phrase_prefix("the term00003", k=20).collect()]
        assert a == b


@pytest.fixture(scope="module")
def fates(spark, tmp_root):
    """FatesIndex over a contacts-shaped two-field corpus (the reference's
    own data model: [last_name, first_name], tasks/fates.rake:49)."""
    from fatespark.corpus import contacts_df
    d = str(tmp_root / "fates_compat_idx")
    corpus = contacts_df(spark, 2000, partitions=4)
    fi = FatesIndex.fulltext_index(
        spark, corpus, d, ["last_name", "first_name"], id_col="id",
        build_id="compat")
    rows = corpus.select("id", "last_name", "first_name").collect()
    return fi, [(r["id"], r["last_name"], r["first_name"]) for r in rows]


class TestFatesIndexVeneer:
    def test_count_prefix_semantics(self, fates):
        fi, rows = fates
        for q in ("smith", "fa", "zzznope"):
            want = sum(1 for _, ln, fn in rows for v in (ln, fn)
                       for t in _TOKEN.findall(v)
                       if t.lower().startswith(q))
            assert fi.fulltext_count(q) == want, q

    def test_cross_field_phrase_never_matches(self, fates):
        """fates' heap separates fields with length prefixes, so a phrase
        can't span last_name -> first_name; neither can ours (documented
        parity)."""
        fi, rows = fates
        pair = next(((ln, fn) for _, ln, fn in rows), None)
        assert fi.fulltext_count(f"{pair[0]} {pair[1]}") == 0

    def test_find_returns_reference_shape(self, fates):
        fi, rows = fates
        got = fi.fulltext_find("Smith", 0, 10)
        assert len(got) == 10
        by_id = {i: (ln, fn) for i, ln, fn in rows}
        for pk, fields, score in got:
            assert score > 0.0
            assert fields == list(by_id[pk])
            assert any(t.lower().startswith("smith")
                       for v in fields for t in _TOKEN.findall(v))

    def test_find_pagination_windows(self, fates):
        fi, _ = fates
        full = fi.fulltext_find("Smith", 0, 10)
        page = fi.fulltext_find("Smith", 5, 5)
        assert page == full[5:]

    def test_find_unranked_scores_zero(self, fates):
        fi, _ = fates
        got = fi.fulltext_find("Smith", 0, 3, ranked=False)
        assert got and all(s == 0.0 for _, _, s in got)


class TestLocalPhrasePrefixParity:
    @pytest.fixture(scope="class")
    def local(self, pidx, tmp_root):
        from fatespark.local import LocalSearchIndex
        return LocalSearchIndex(str(tmp_root / "phrase_prefix_idx"))

    def test_count_phrase_matches(self, pidx, local):
        idx, _ = pidx
        for q, pre in [("the term00003", False), ("the term0000", True),
                       ("fa", True), ("the", False)]:
            assert local.count_phrase(q, prefix=pre, max_expansions=1024) == \
                idx.count_phrase(q, prefix=pre, max_expansions=1024), q

    def test_search_phrase_prefix_matches(self, pidx, local):
        idx, _ = pidx
        a = [(r["doc_id"], r["score"]) for r in
             idx.search_phrase_prefix("the term0000", k=10,
                                      max_expansions=64).collect()]
        b = local.search_phrase_prefix("the term0000", k=10,
                                       max_expansions=64)
        assert a == list(zip(b["doc_id"].tolist(), b["score"].tolist()))


def test_fates_veneer_composes_with_pfor_codec(spark, tmp_root):
    """Veneer x codec composition: fulltext_index with BuildConfig(codec=
    'pfor') must answer identically to the varint build of the same data."""
    from fatespark.build import BuildConfig
    from fatespark.corpus import contacts_df
    corpus = contacts_df(spark, 800, partitions=2)
    out = {}
    for codec in ("varint", "pfor"):
        fi = FatesIndex.fulltext_index(
            spark, corpus, str(tmp_root / f"compat_{codec}_idx"),
            ["last_name", "first_name"], id_col="id",
            config=BuildConfig(n_buckets=2, salt_bits=0, codec=codec),
            build_id=f"c-{codec}")
        out[codec] = (fi.fulltext_count("smith"), fi.fulltext_count("fa"),
                      fi.fulltext_find("Smith", 0, 5))
    assert out["varint"] == out["pfor"]
