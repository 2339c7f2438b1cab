"""Query-string language: parse goldens + execution must be EXACTLY the
underlying engine call it routes to (same kernels, same oracle coverage)."""

import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_df
from fatespark.local import LocalSearchIndex
from fatespark.query import SearchIndex
from fatespark.querylang import (ParsedQuery, QuerySyntaxError,
                                 UnsupportedQueryError, execute, parse_query)


@pytest.fixture(scope="module")
def idx(spark, tmp_root):
    d = str(tmp_root / "querylang_idx")
    IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1)).build(
        spark, pages_df(spark, 3000, partitions=4), build_id="ql")
    return SearchIndex(spark, d), LocalSearchIndex(d)


class TestParse:
    def test_terms_prefixes_excludes(self):
        p = parse_query('merge scan -join st* -xy*')
        assert p == ParsedQuery(terms=["merge", "scan"], prefixes=["st"],
                                exclude_terms=["join"],
                                exclude_prefixes=["xy"])

    def test_phrase(self):
        p = parse_query('  "big data"  ')
        assert p.phrase == "big data" and not p.phrase_prefix

    def test_phrase_prefix(self):
        p = parse_query('"big dat"*')
        assert p.phrase == "big dat" and p.phrase_prefix

    def test_field_filter(self):
        p = parse_query('batch source:src3 lang:en')
        assert p.terms == ["batch"]
        assert p.filters == [("source", "src3"), ("lang", "en")]
        # ':' must be strictly interior — edge colons stay ordinary terms
        assert parse_query("a: :b :").terms == ["a:", ":b", ":"]

    def test_slop(self):
        p = parse_query('"big data"~3')
        assert p.phrase == "big data" and p.slop == 3
        assert not p.phrase_prefix
        assert parse_query('"a b"').slop is None

    def test_lone_hyphen_is_a_term(self):
        # '-' not followed by an atom char is just a token
        assert parse_query("a - b").terms == ["a", "-", "b"]

    def test_errors(self):
        with pytest.raises(QuerySyntaxError):
            parse_query('"unterminated')
        with pytest.raises(QuerySyntaxError):
            parse_query("mid*dle")
        with pytest.raises(UnsupportedQueryError):
            parse_query('-"no phrase exclusion"')
        with pytest.raises(UnsupportedQueryError):
            parse_query('"a b" extra')
        with pytest.raises(UnsupportedQueryError):
            parse_query("-onlynegative")
        with pytest.raises(QuerySyntaxError):
            parse_query('"a b"~')
        with pytest.raises(UnsupportedQueryError):
            parse_query('-source:src3')
        with pytest.raises(UnsupportedQueryError):
            parse_query('"a b" source:src3')
        with pytest.raises(UnsupportedQueryError):
            parse_query('source:src3')   # filter-only


def _rows(df):
    if hasattr(df, "collect"):
        return [(r["doc_id"], r["score"]) for r in df.collect()]
    return list(zip(df["doc_id"].tolist(), df["score"].tolist()))


class TestExecute:
    def test_terms_route_to_search(self, idx):
        dist, _ = idx
        got = _rows(execute(dist, "the smith", k=10, mode="AND"))
        want = _rows(dist.search(["smith", "the"], k=10, mode="AND"))
        assert got == want and got

    def test_exclusion(self, idx):
        dist, _ = idx
        got = _rows(execute(dist, "smith -the", k=10, mode="OR"))
        want = _rows(dist.search(["smith"], k=10, mode="OR",
                                 exclude=["the"]))
        assert got == want

    def test_prefix_expands_into_the_same_call(self, idx):
        dist, _ = idx
        got = _rows(execute(dist, "sm*", k=10, mode="OR"))
        want = _rows(dist.search_prefix("sm", k=10))
        assert got == want and got

    def test_phrase_routes_to_phrase_matcher(self, idx):
        dist, _ = idx
        got = _rows(execute(dist, '"the smith"', k=10))
        want = _rows(dist.search_phrase("the smith", k=10))
        assert got == want

    def test_field_filter_routes_to_filtered_search(self, idx):
        dist, loc = idx
        got = _rows(execute(dist, "the source:smith", k=10,
                            field_names={"source": 0}))
        want = _rows(dist.search(["the"], k=10, mode="OR",
                                 filter_terms=["smith"], filter_field=0))
        assert got == want and got
        # local reader parity through the same string
        lgot = _rows(execute(loc, "the source:smith", k=10,
                             field_names={"source": 0}))
        assert lgot == got
        with pytest.raises(UnsupportedQueryError):
            execute(dist, "the nosuch:x", k=10, field_names={"source": 0})
        with pytest.raises(UnsupportedQueryError):
            execute(dist, "the a:x b:y", k=10,
                    field_names={"a": 0, "b": 1})

    def test_slop_routes_to_search_near(self, idx):
        dist, _ = idx
        got = _rows(execute(dist, '"the smith"~4', k=10))
        want = _rows(dist.search_near("the smith", 4, k=10))
        assert got == want

    def test_no_matching_atoms_is_empty(self, idx):
        dist, _ = idx
        assert _rows(execute(dist, "zzzznope*", k=10, mode="OR")) == []

    def test_local_parity(self, idx):
        dist, loc = idx
        for q in ["the smith", "smith -the", "sm* -jones", '"the smith"',
                  '"the smith"~4']:
            a = _rows(execute(dist, q, k=10, mode="OR"))
            b = _rows(execute(loc, q, k=10, mode="OR"))
            assert a == b, q


class TestBoosts:
    def test_parse_boost(self):
        p = parse_query("batch join^2 scan^0.5")
        assert p.terms == ["batch", "join", "scan"]
        assert p.boosts == {"join": 2.0, "scan": 0.5}

    def test_parse_boost_errors(self):
        import pytest as _pt
        from fatespark.querylang import (QuerySyntaxError,
                                         UnsupportedQueryError)
        with _pt.raises(QuerySyntaxError):
            parse_query("join^x")
        with _pt.raises(QuerySyntaxError):
            parse_query("join^0")
        with _pt.raises(UnsupportedQueryError):
            parse_query("-join^2")
        with _pt.raises(QuerySyntaxError):  # '*' not trailing once ^2 ends it
            parse_query("jo*^2")
        # a lone '^'-leading token is a term, not a boost
        assert parse_query("^2").terms == ["^2"]

    def test_boost_one_is_identity(self, idx):
        sidx, _ = idx
        a = execute(sidx, "the smith^1", k=10, mode="OR").collect()
        b = execute(sidx, "the smith", k=10, mode="OR").collect()
        assert [(r["doc_id"], r["score"]) for r in a] == \
               [(r["doc_id"], r["score"]) for r in b]

    def test_boost_scales_contribution(self, idx):
        sidx, _ = idx
        # single-term query: boosting the only term scales every score
        base = {r["doc_id"]: r["score"]
                for r in execute(sidx, "smith", k=10).collect()}
        boosted = {r["doc_id"]: r["score"]
                   for r in execute(sidx, "smith^2", k=10).collect()}
        assert set(base) == set(boosted)
        for d, s in base.items():
            assert boosted[d] == s * 2.0

    def test_boost_changes_ranking(self, idx):
        sidx, _ = idx
        a = [r["doc_id"] for r in
             execute(sidx, "smith jones", k=10, mode="OR").collect()]
        b = [r["doc_id"] for r in
             execute(sidx, "smith jones^8", k=10, mode="OR").collect()]
        assert a != b  # a big boost must reorder a two-term OR

    def test_local_parity(self, idx):
        sidx, loc = idx
        a = execute(sidx, "smith jones^2", k=10, mode="OR",
                    quantize=4).collect()
        b = execute(loc, "smith jones^2", k=10, mode="OR", quantize=4)
        assert [(r["doc_id"], r["score"]) for r in a] == \
               list(zip(b["doc_id"].tolist(), b["score"].tolist()))


class TestSynonyms:
    def test_expands_to_or_bag(self, idx):
        sidx, loc = idx
        a = _rows(execute(sidx, "smith", k=10, mode="OR",
                          synonyms={"smith": ["jones"]}))
        b = _rows(sidx.search(["jones", "smith"], k=10, mode="OR"))
        assert a == b and a
        # local reader too
        la = _rows(execute(loc, "smith", k=10, mode="OR",
                           synonyms={"smith": ["jones"]}))
        assert la == a

    def test_unknown_term_no_op(self, idx):
        sidx, _ = idx
        a = _rows(execute(sidx, "smith", k=10, mode="OR",
                          synonyms={"other": ["jones"]}))
        b = _rows(sidx.search(["smith"], k=10, mode="OR"))
        assert a == b

    def test_and_mode_raises(self, idx):
        sidx, _ = idx
        with pytest.raises(UnsupportedQueryError):
            execute(sidx, "smith", k=10, mode="AND",
                    synonyms={"smith": ["jones"]})


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestFuzzy:
    def test_parse_fuzzy(self):
        p = parse_query("smth~1 scan")
        assert p.fuzzy == [("smth", 1)] and p.terms == ["scan"]
        # ~0 is just the exact term
        assert parse_query("scan~0").terms == ["scan"]
        assert parse_query("scan~0").fuzzy == []

    def test_parse_fuzzy_errors(self):
        with pytest.raises(QuerySyntaxError):
            parse_query("merge~x")
        with pytest.raises(UnsupportedQueryError):
            parse_query("-smth~1")
        with pytest.raises(UnsupportedQueryError):
            parse_query("smth~1^2")

    def test_expansion_is_the_exact_neighborhood(self, idx):
        """Deletion-band expansion == brute-force levenshtein<=1 over the
        whole vocabulary (completeness at distance 1), on both readers."""
        dist, loc = idx
        vocab = [r["term"] for r in
                 dist.terms.select("term").distinct().collect()]
        for q in ("smth", "smith", "jone"):
            want = sorted({t for t in vocab if _lev(t, q) <= 1})
            assert dist.expand_fuzzy(q) == want, q
            assert loc.expand_fuzzy(q) == want, q
        assert "smith" in dist.expand_fuzzy("smth")

    def test_execute_scores_as_or_bag(self, idx):
        dist, _ = idx
        got = _rows(execute(dist, "smth~1", k=10))
        want = _rows(dist.search(dist.expand_fuzzy("smth"), k=10,
                                 mode="OR"))
        assert got == want and got

    def test_local_parity(self, idx):
        dist, loc = idx
        a = _rows(execute(dist, "smth~1 jone~1", k=10, mode="OR"))
        b = _rows(execute(loc, "smth~1 jone~1", k=10, mode="OR"))
        assert a == b and a

    def test_max_edit_above_two_rejected(self, idx):
        dist, loc = idx
        with pytest.raises(ValueError):
            dist.expand_fuzzy("smith", max_edit=3)
        with pytest.raises(ValueError):
            loc.expand_fuzzy("smith", max_edit=3)


class TestFuzzy2:
    def test_depth2_variants_jvm_matches_python(self, idx):
        from pyspark.sql import functions as F

        from fatespark.suggest import deletion_variants, dictionary_variants
        dist, _ = idx
        sample = (dist.terms.select("term").distinct()
                  .orderBy("term").limit(30))
        got = {}
        for r in dictionary_variants(sample.withColumn("df", F.lit(1)),
                                     depth=2).collect():
            got.setdefault(r["term"], set()).add(r["variant"])
        for t, vs in got.items():
            assert vs == set(deletion_variants(t, depth=2)), t

    def test_expansion_is_exact_distance2_neighborhood(self, idx):
        dist, loc = idx
        vocab = [r["term"] for r in
                 dist.terms.select("term").distinct().collect()]
        for q in ("smth", "jnes", "smith"):
            want = sorted({t for t in vocab if _lev(t, q) <= 2})
            assert dist.expand_fuzzy(q, max_edit=2) == want, q
            assert loc.expand_fuzzy(q, max_edit=2) == want, q

    def test_execute_tilde2(self, idx):
        dist, loc = idx
        a = _rows(execute(dist, "smih~2", k=10, mode="OR"))
        want = _rows(dist.search(dist.expand_fuzzy("smih", max_edit=2),
                                 k=10, mode="OR"))
        assert a == want and a
        b = _rows(execute(loc, "smih~2", k=10, mode="OR"))
        assert a == b

    def test_tilde3_rejected(self, idx):
        dist, _ = idx
        with pytest.raises(UnsupportedQueryError):
            execute(dist, "smith~3", k=5)
