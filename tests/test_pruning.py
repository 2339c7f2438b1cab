"""Static index pruning (Carmel et al. 2001): threshold exactness against a
brute-force decode, the top-k preservation guarantee, eps=0 identity, and
tombstone hygiene.  The reference always serves the full corpus
(``lib/fragment_writer.rb``); pruning is the serving-tier extension."""

import numpy as np
import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.codec import get_codec
from fatespark.corpus import pages_df
from fatespark.pruning import _part_vec, prune_index
from fatespark.query import SearchIndex

EPS = 0.8
KP = 5


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("prune") / "idx")
    b = IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1))
    b.build(spark, pages_df(spark, 1500, partitions=4), build_id="p")
    return SearchIndex(spark, d)


def _decode_by_term(idx):
    """term -> (doc_ids, tfs, dls) full decode (test-sized index)."""
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


def _brute_kept(idx, k_prune=KP, eps=EPS):
    """Brute-force Carmel kept-set per term from the FULL index decode."""
    kept = {}
    for (term, fld), (docs, tfs, dls) in _decode_by_term(idx).items():
        av = np.full(docs.size, idx.field_avgdl.get(fld, idx.avgdl))
        part = _part_vec(tfs, dls, av)
        r = min(k_prune, part.size)
        z = np.sort(part)[::-1][r - 1]
        m = part > eps * z
        kept[(term, fld)] = set(docs[m].tolist())
    return kept


def test_threshold_matches_bruteforce(spark, built, tmp_path):
    p = prune_index(spark, built, str(tmp_path / "pr"), k_prune=KP, eps=EPS)
    expect = _brute_kept(built)
    got = {k: set(v[0].tolist()) for k, v in _decode_by_term(p).items()}
    assert got == {k: v for k, v in expect.items() if v}
    # it actually pruned something
    n_full = sum(len(v) for v in expect.values())
    n_all = built.postings.count()
    assert p.postings.count() <= n_all
    assert sum(len(v) for v in got.values()) == n_full
    assert n_full < sum(d[0].size for d in _decode_by_term(built).values())


def test_topk_preserved_per_term(spark, built, tmp_path):
    p = prune_index(spark, built, str(tmp_path / "pr2"), k_prune=KP, eps=EPS)
    for term in ["the", "smith", "data"]:
        full = built.search([term], k=KP, quantize=4).collect()
        pr = p.search([term], k=KP, quantize=4).collect()
        assert [(r["doc_id"], r["score"]) for r in full] == \
               [(r["doc_id"], r["score"]) for r in pr]


def test_eps_zero_is_identity(spark, built, tmp_path):
    p = prune_index(spark, built, str(tmp_path / "pr0"), k_prune=KP, eps=0.0)
    assert int(p.postings.agg({"n": "sum"}).collect()[0][0]) == \
           int(built.postings.agg({"n": "sum"}).collect()[0][0])
    q = ["the", "smith", "jones"]
    full = built.search(q, k=10, mode="OR", quantize=4).collect()
    pr = p.search(q, k=10, mode="OR", quantize=4).collect()
    assert [(r["doc_id"], r["score"]) for r in full] == \
           [(r["doc_id"], r["score"]) for r in pr]
    # positions survive the rewrite: phrase search still works
    ph_f = built.search_phrase("the smith", k=5).collect()
    ph_p = p.search_phrase("the smith", k=5).collect()
    assert [r["doc_id"] for r in ph_f] == [r["doc_id"] for r in ph_p]


def test_eps_bounds():
    with pytest.raises(ValueError):
        prune_index(None, None, "/tmp/x", eps=1.0)


def test_tombstones_dropped(spark, tmp_path):
    d = str(tmp_path / "idx")
    b = IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0))
    b.build(spark, pages_df(spark, 600, partitions=2), build_id="t")
    idx = SearchIndex(spark, d)
    victims = [r["doc_id"] for r in idx.search(["the"], k=3).collect()]
    b.delete_docs(spark, victims)
    idx = SearchIndex(spark, d)
    p = prune_index(spark, idx, str(tmp_path / "pr"), k_prune=KP, eps=EPS)
    assert p.tombstones is None
    for (_, _), (docs, _, _) in _decode_by_term(p).items():
        assert not set(docs.tolist()) & set(victims)
    assert not set(victims) & {
        r["doc_id"] for r in p.search(["the"], k=10).collect()}
    # thresholds were computed over LIVE postings only: the post-delete
    # top-k of a term survives pruning exactly
    full = idx.search(["the"], k=KP, quantize=4).collect()
    pr = p.search(["the"], k=KP, quantize=4).collect()
    assert [(r["doc_id"], r["score"]) for r in full] == \
           [(r["doc_id"], r["score"]) for r in pr]
