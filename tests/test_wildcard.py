"""Wildcard/infix search: trigram banding, exact-verify parity, scoring."""

import fnmatch

import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.query import SearchIndex
from fatespark.wildcard import (dictionary_trigrams, expand_wildcard,
                                pattern_regex, pattern_trigrams,
                                search_wildcard)

DOCS = [
    (1, "batch batching rebatch dispatch match"),
    (2, "scan scanner scanning rescan"),
    (3, "sort sorted resort assorted"),
    (4, "Part spark PARSE sparse partition"),
    (5, "a ab abc x"),
]

PATTERNS = ["*par*", "*atch*", "scan*", "*ing", "s*t", "*a*", "abc", "*",
            "re*ch", "*sort*", "z*", "*zz*", "sc*ing", "*an*er*"]


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    d = str(tmp_root / "wild_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="wild")
    return SearchIndex(spark, d)


def _vocab():
    return sorted({t.lower() for _, x in DOCS for t in x.split()})


@pytest.mark.parametrize("pat", PATTERNS)
def test_expansion_matches_fnmatch(built, pat):
    want = sorted(t for t in _vocab() if fnmatch.fnmatchcase(t, pat))
    got = expand_wildcard(built, pat, max_terms=None)
    assert got == want, pat


def test_banding_is_superset_never_filter(built):
    """The trigram band may only ADD candidates relative to the exact
    match set — verify by checking every fnmatch term carries all the
    pattern trigrams (the banding invariant)."""
    for pat in PATTERNS:
        grams = pattern_trigrams(pat)
        for t in _vocab():
            if fnmatch.fnmatchcase(t, pat):
                aug = "^" + t + "$"
                assert all(g in aug for g in grams), (pat, t)


def test_pattern_regex_escaping():
    assert pattern_regex("a*b") == "^a.*b$"
    assert pattern_regex("c++*") == "^c\\+\\+.*$"
    assert pattern_regex("*") == "^.*$"


def test_search_equals_manual_or(built):
    terms = expand_wildcard(built, "*atch*", max_terms=None)
    manual = built.search(terms, k=10, mode="OR").collect()
    got = search_wildcard(built, "*atch*", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in manual]


def test_no_match_empty(built):
    assert search_wildcard(built, "*zzz*", k=5).count() == 0


def test_max_terms_cap_ascending(built):
    all_a = expand_wildcard(built, "*a*", max_terms=None)
    capped = expand_wildcard(built, "*a*", max_terms=3)
    assert capped == all_a[:3]


def test_persisted_trigrams_parity(built, tmp_root, spark):
    p = str(tmp_root / "wild_trigrams")
    dictionary_trigrams(built.terms).write.mode("overwrite").parquet(p)
    pre = spark.read.parquet(p)
    for pat in ["*par*", "scan*", "*ing"]:
        assert expand_wildcard(built, pat, trigrams=pre) == \
               expand_wildcard(built, pat)


def test_plan_no_nested_loop(built):
    df = search_wildcard(built, "*atch*", k=5)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# --------------------------------------------------------------------------
# Regexp term query (Lucene RegexpQuery contract: implicitly anchored)
# --------------------------------------------------------------------------

REGEXPS = ["sc.n", "s.*t", "re(scan|sort)", "part|parse", "b[aeiou]tch.*",
           "scan(ner|ning)?", "a{1,2}b?", ".*ing", "x", "z+", "sp.rk",
           "as+orted", "[ps]art", "m.tch(es)?"]


class TestRegexp:
    def test_expansion_matches_fullmatch(self, built):
        import re as _re
        from fatespark.wildcard import expand_regexp
        for rx in REGEXPS:
            want = sorted(t for t in _vocab() if _re.fullmatch(rx, t))
            got = expand_regexp(built, rx, max_terms=None)
            assert got == want, rx

    def test_banding_invariant(self, built):
        """Every full match of rx must contain ALL required trigrams of
        its augmented '^term$' form — otherwise banding could drop it."""
        import re as _re
        from fatespark.wildcard import regexp_trigrams
        for rx in REGEXPS:
            grams = regexp_trigrams(rx)
            for t in _vocab():
                if _re.fullmatch(rx, t):
                    aug = f"^{t}$"
                    assert all(g in aug for g in grams), (rx, t, grams)

    def test_search_equals_manual_or(self, built):
        from fatespark.wildcard import expand_regexp, search_regexp
        rx = "sc.n(ner|ning)?"
        terms = expand_regexp(built, rx)
        assert terms  # scan scanner scanning
        a = [(r["doc_id"], r["score"]) for r in
             search_regexp(built, rx, k=10).collect()]
        b = [(r["doc_id"], r["score"]) for r in
             built.search(terms, k=10, mode="OR").collect()]
        assert a == b

    def test_no_match_empty(self, built):
        from fatespark.wildcard import search_regexp
        assert search_regexp(built, "zz+q").collect() == []

    def test_persisted_trigram_table_parity(self, built, spark):
        from fatespark.wildcard import (dictionary_trigrams, expand_regexp)
        tg = dictionary_trigrams(built.terms).cache()
        try:
            for rx in ["sc.n", "b[aeiou]tch.*"]:
                assert expand_regexp(built, rx, trigrams=tg) == \
                    expand_regexp(built, rx)
        finally:
            tg.unpersist()
