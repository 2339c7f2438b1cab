"""Phrase suggester: stupid-backoff LM scores vs a brute recompute,
keep-original / max_errors contracts, and DuckDB-twin parity."""

import math

import duckdb
import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.phrasesuggest import phrase_suggest, phrase_suggest_sql
from fatespark.query import SearchIndex
from fatespark.suggest import suggest

DOCS = [
    (1, "batch scan join merge batch scan"),
    (2, "batch join sort shirt short"),
    (3, "match latch catch batch scan"),
    (4, "scan scant span spin scan join"),
    (5, "row slow grow crow low slow join"),
    (6, "shirt row table shirt row"),
]


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    d = str(tmp_root / "psugg_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="psugg")
    return SearchIndex(spark, d), df


def brute_lm(qlists, discount=0.4):
    """Stupid-backoff bigram LM over DOCS, same expressions as the op."""
    toks = [d[1].lower().split() for d in DOCS]
    cf: dict[str, int] = {}
    bc: dict[tuple, int] = {}
    for ts in toks:
        for t in ts:
            cf[t] = cf.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    T = sum(len(ts) for ts in toks)
    V = len(cf)
    denom = float(T + V)

    def score(words):
        s = math.log((cf.get(words[0], 0) + 1.0) / denom)
        for a, b in zip(words, words[1:]):
            if (a, b) in bc:
                s += math.log(bc[(a, b)] / float(cf[a]))
            else:
                s += math.log(discount * (cf.get(b, 0) + 1.0) / denom)
        return s

    return score


def test_scores_match_brute(built):
    idx, docs = built
    q = ["bacth", "jion"]
    got = phrase_suggest(idx, docs, q, k=10, m=5, max_edit=2,
                         max_errors=2, quantize=6).collect()
    assert got, "expected at least one correction"
    sc = brute_lm(q)
    for r in got:
        want = math.floor(sc(r["phrase"].split()) * 1e6) / 1e6
        assert r["score"] == pytest.approx(want, rel=0, abs=2e-6), r
    # ordering: score DESC, phrase ASC
    keys = [(-r["score"], r["phrase"]) for r in got]
    assert keys == sorted(keys)


def test_keep_original_and_max_errors(built):
    idx, docs = built
    # "zzqq" has no dictionary candidate -> kept verbatim at its position
    got = phrase_suggest(idx, docs, ["bacth", "zzqq"], k=10, m=5,
                         max_edit=2, max_errors=2).collect()
    assert got and all(r["phrase"].split()[1] == "zzqq" for r in got)
    assert all(r["n_errors"] <= 2 for r in got)
    # with max_errors=0 only all-original phrases survive; "bacth" is not
    # in the dictionary and has candidates, so nothing qualifies
    none = phrase_suggest(idx, docs, ["bacth", "jion"], k=10, m=5,
                          max_edit=2, max_errors=0).collect()
    assert none == []


def test_n_errors_counts_changed_positions(built):
    idx, docs = built
    got = phrase_suggest(idx, docs, ["batch", "jion"], k=10, m=5,
                         max_edit=2, max_errors=2).collect()
    assert got
    for r in got:
        w0, w1 = r["phrase"].split()
        assert r["n_errors"] == (w0 != "batch") + (w1 != "jion")


def test_duckdb_twin_parity(built):
    idx, docs = built
    q = ["batch", "jion", "sow"]
    got = phrase_suggest(idx, docs, q, k=5, m=5, max_edit=2,
                         max_errors=2).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = con.execute(phrase_suggest_sql(
        "documents", q, k=5, m=5, max_edit=2, max_errors=2)).fetchall()
    assert [(r["phrase"], r["n_errors"], r["score"]) for r in got] == want


def brute_collate(phrase):
    """True iff some DOCS row contains every word of the phrase."""
    ws = set(phrase.split())
    return any(ws <= set(d[1].lower().split()) for d in DOCS)


def test_collate_filter_drops_unmatched(built):
    idx, docs = built
    # 'shirt'/'short' x 'crow'/'row' candidates: only 'shirt row'
    # co-occurs (doc 6) — collate keeps exactly the matchable phrases
    q = ["shirt", "crw"]
    plain = phrase_suggest(idx, docs, q, k=20, m=5, max_edit=2,
                           max_errors=2).collect()
    assert any(not brute_collate(r["phrase"]) for r in plain)
    got = phrase_suggest(idx, docs, q, k=20, m=5, max_edit=2,
                         max_errors=2, collate=True).collect()
    assert got and all(brute_collate(r["phrase"]) for r in got)
    # collate only FILTERS: surviving (phrase, score) rows are unchanged
    keep = {r["phrase"]: r["score"] for r in plain
            if brute_collate(r["phrase"])}
    assert {r["phrase"]: r["score"] for r in got} == keep


def test_collate_prune_annotates(built):
    idx, docs = built
    got = phrase_suggest(idx, docs, ["shirt", "crw"], k=20, m=5,
                         max_edit=2, max_errors=2,
                         collate_prune=True).collect()
    assert {r["collate_match"] for r in got} == {0, 1}
    for r in got:
        assert bool(r["collate_match"]) == brute_collate(r["phrase"]), r


def test_collate_sql_twin_parity(built):
    import duckdb
    idx, docs = built
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    for kw in ({"collate": True}, {"collate_prune": True}):
        got = phrase_suggest(idx, docs, ["shirt", "crw"], k=20, m=5,
                             max_edit=2, max_errors=2, **kw).collect()
        want = con.execute(phrase_suggest_sql(
            "documents", ["shirt", "crw"], k=20, m=5, max_edit=2,
            max_errors=2, **kw)).fetchall()
        assert [tuple(r) for r in got] == want, kw


def test_candidates_come_from_term_suggester(built):
    idx, docs = built
    got = phrase_suggest(idx, docs, ["scna"], k=10, m=3,
                         max_edit=2, max_errors=1).collect()
    cand = {r["suggestion"]
            for r in suggest(idx, ["scna"], k=3, max_edit=2).collect()}
    assert cand and {r["phrase"] for r in got} <= cand


class TestServedLm:
    def test_served_counts_bit_identical(self, spark, built):
        """phrase_suggest over a persisted bigram_lm == the on-the-fly
        corpus passes, bit-exact (same counts -> same floats)."""
        from fatespark.phrasesuggest import write_bigram_lm
        idx, docs = built
        write_bigram_lm(idx, docs, n_buckets=8)
        total = 0
        for q in (["bacth", "jion"], ["shirt", "crw"], ["scn"]):
            live = phrase_suggest(idx, docs, q, k=10, m=5, max_edit=2,
                                  use_lm=False).collect()
            served = phrase_suggest(idx, docs, q, k=10, m=5,
                                    max_edit=2).collect()
            assert [tuple(r) for r in served] == [tuple(r) for r in live]
            total += len(served)
        assert total >= 4

    def test_probe_prunes_partitions(self, spark, built):
        """The pairs probe carries the b1 partition filter (physical
        directory pruning) and the t1/t2 IN-list (row-group pruning)."""
        from fatespark.phrasesuggest import _lm_tables, write_bigram_lm
        idx, docs = built
        write_bigram_lm(idx, docs, n_buckets=8)
        cv = ["batch", "join"]
        pairs, uni, tot, voc = _lm_tables(idx, cv)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "b1" in plan
        got = {(r["t1"], r["t2"]): r["bc"] for r in pairs.collect()}
        assert got == {("batch", "join"): 1}

    def test_collate_composes_with_served_lm(self, spark, built):
        from fatespark.phrasesuggest import write_bigram_lm
        idx, docs = built
        write_bigram_lm(idx, docs, n_buckets=8)
        a = phrase_suggest(idx, docs, ["bacth", "jion"], k=10, m=5,
                           max_edit=2, collate=True, use_lm=False).collect()
        b = phrase_suggest(idx, docs, ["bacth", "jion"], k=10, m=5,
                           max_edit=2, collate=True).collect()
        assert [tuple(r) for r in b] == [tuple(r) for r in a]


class TestLocalPhraseSuggest:
    def test_parity_with_distributed_depth2(self, spark, built):
        """phrase_suggest_local over the persisted sidecars ==
        phrase_suggest(depth=2) (SymSpell complete mode), same floats."""
        from fatespark.local import LocalSearchIndex
        from fatespark.phrasesuggest import (phrase_suggest_local,
                                             write_bigram_lm)
        from fatespark.suggest import write_fuzzy_variants
        idx, docs = built
        write_fuzzy_variants(idx, depth=2)
        write_bigram_lm(idx, docs, n_buckets=8)
        lidx = LocalSearchIndex(idx.index_dir)
        for q in (["bacth", "jion"], ["shirt", "crw"], ["scn"]):
            dist = phrase_suggest(idx, docs, q, k=10, m=5, max_edit=2,
                                  depth=2).collect()
            loc = phrase_suggest_local(lidx, q, k=10, m=5, max_edit=2)
            got = [(r.phrase, int(r.n_errors), r.score)
                   for r in loc.itertuples()]
            exp = [(r["phrase"], r["n_errors"], r["score"]) for r in dist]
            assert got == exp

    def test_requires_sidecars(self, spark, tmp_root):
        from fatespark.build import BuildConfig, IndexBuilder
        from fatespark.local import LocalSearchIndex
        from fatespark.phrasesuggest import phrase_suggest_local
        d = str(tmp_root / "psugg_bare")
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
            spark, df, id_col="doc_id", url_col="doc_id",
            text_col="text", build_id="bare")
        lidx = LocalSearchIndex(d)
        with pytest.raises(ValueError):
            phrase_suggest_local(lidx, ["bacth"])
