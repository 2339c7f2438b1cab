"""Impact-ordered quantized index (Anh & Moffat, SIGIR 2006): quantization
exactness against a brute-force full decode, the qmin cutoff contract,
tombstone hygiene, and the integer-scorer rank agreement at the head.  The
reference always scores floats at query time (``lib/fates.rb:65``); the
impact index is the published serving-tier alternative."""

import numpy as np
import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.codec import get_codec
from fatespark.corpus import pages_df
from fatespark.impact import ImpactIndex, build_impact_index
from fatespark.oracle import idf as idf_fn
from fatespark.pruning import _part_vec
from fatespark.query import SearchIndex

BITS = 8
LEVELS = float((1 << BITS) - 1)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("impact") / "idx")
    b = IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1))
    b.build(spark, pages_df(spark, 1200, partitions=4), build_id="im")
    return SearchIndex(spark, d)


@pytest.fixture(scope="module")
def imp(spark, built, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("impact") / "imp")
    info = build_impact_index(spark, built, d, bits=BITS)
    assert info["levels"] == int(LEVELS)
    assert info["max_score"] > 0
    return ImpactIndex(spark, d)


def _decode_by_term(idx):
    c = get_codec(idx.codec_name)
    acc = {}
    for r in idx.postings.collect():
        key = (r["term"], int(r["field"]))
        docs = c.decode_ids(r["docs"], int(r["n"]))
        tfs = c.decode_u32s(r["tfs"], int(r["n"]))
        dls = c.decode_u32s(r["dls"], int(r["n"]))
        acc.setdefault(key, []).append((int(r["block_id"]), docs, tfs, dls))
    out = {}
    for key, blocks in acc.items():
        blocks.sort(key=lambda x: (x[0], x[1][0] if x[1].size else 0))
        out[key] = tuple(np.concatenate([b[i] for b in blocks])
                         for i in (1, 2, 3))
    return out


def _brute_quant(idx, dead=frozenset()):
    """(doc, term) -> integer impact, via the exact engine float path."""
    dfs = {(r["term"], int(r["field"])): int(r["df"])
           for r in idx.terms.collect()}
    s_all = {}
    for (term, fld), (docs, tfs, dls) in _decode_by_term(idx).items():
        av = np.full(docs.size, idx.field_avgdl.get(fld, idx.avgdl))
        part = _part_vec(tfs, dls, av)
        s = idf_fn(idx.n_docs, dfs[(term, fld)]) * part
        for d, sv in zip(docs.tolist(), s.tolist()):
            if d not in dead:
                s_all[(d, term, fld)] = sv
    m = max(s_all.values())
    return {k: int(np.floor((v / m) * LEVELS)) for k, v in s_all.items()}, m


def _brute_topk(quant, qterms, k=10, qmin=0):
    per_doc = {}
    for (d, term, fld), q in quant.items():
        if term in qterms and q >= qmin:
            per_doc[d] = per_doc.get(d, 0) + q
    return sorted(per_doc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_search_matches_bruteforce(spark, built, imp):
    quant, m = _brute_quant(built)
    assert imp.max_score == pytest.approx(m, abs=0.0)  # bit-equal
    for qterms, qmin in ([["smith", "data"], 0], [["the"], 0],
                         [["smith", "data", "merge"], 1],
                         [["smith", "data", "merge"], 40]):
        got = [(r["doc_id"], r["impact_score"])
               for r in imp.search(qterms, k=10, qmin=qmin).collect()]
        assert got == _brute_topk(quant, set(qterms), k=10, qmin=qmin), \
            (qterms, qmin)


def test_max_posting_hits_top_level(spark, built, imp):
    quant, _ = _brute_quant(built)
    assert max(quant.values()) == int(LEVELS)
    top = imp.impacts.agg({"q": "max"}).collect()[0][0]
    assert int(top) == int(LEVELS)


def test_qmin_prunes_and_is_subset_consistent(spark, imp):
    """qmin only drops contributions: scores at qmin>0 are <= qmin=0
    scores doc-by-doc, and the qmin predicate is a real scan filter."""
    base = {r["doc_id"]: r["impact_score"]
            for r in imp.search(["smith", "data"], k=10).collect()}
    cut = imp.search(["smith", "data"], k=10, qmin=5)
    for r in cut.collect():
        if r["doc_id"] in base:
            assert r["impact_score"] <= base[r["doc_id"]]
    plan = cut._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(q," in plan or "q >= 5" in plan


def test_tombstones_excluded_at_build(spark, built, tmp_path):
    quant, _ = _brute_quant(built)
    victims = sorted({d for (d, t, f) in quant if t == "smith"})[:5]
    assert victims
    built.tombstones = np.sort(np.asarray(victims, dtype=np.int64))
    try:
        d = str(tmp_path / "imp_tomb")
        build_impact_index(spark, built, d, bits=BITS)
        imp2 = ImpactIndex(spark, d)
        got = [r["doc_id"] for r in
               imp2.search(["smith"], k=1000).collect()]
        assert not set(got) & set(victims)
        quant2, _ = _brute_quant(built, dead=set(victims))
        expect = _brute_topk(quant2, {"smith"}, k=10)
        top = [(r["doc_id"], r["impact_score"])
               for r in imp2.search(["smith"], k=10).collect()]
        assert top == expect
    finally:
        built.tombstones = None


def test_head_rank_agreement_with_bm25(spark, built, imp):
    """8-bit quantization preserves the top-1 (and usually top-3) of the
    float scorer — the published trade: coarse scale, same head."""
    f = [r["doc_id"] for r in
         built.search(["smith", "data"], k=10, mode="OR").collect()]
    i = [r["doc_id"] for r in imp.search(["smith", "data"], k=10).collect()]
    assert f[0] == i[0]
    assert len(set(f[:5]) & set(i[:5])) >= 3


def test_validation(spark, built, imp, tmp_path):
    with pytest.raises(ValueError):
        build_impact_index(spark, built, str(tmp_path / "x"), bits=0)
    assert imp.search([], k=10).count() == 0
    assert imp.search(["zzz-not-a-term"], k=10).count() == 0
