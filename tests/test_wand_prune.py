"""Block-Max WAND must actually SKIP blocks, not just match exhaustive
results — the lazy per-block decode cache makes pruning observable: a block
that is never decoded never enters ``TermBlocks._cache``.

Adversarial shape: one rare high-idf term (few docs, high tf) + one common
low-idf term spread over many blocks. Once the heap holds the rare docs'
scores, the common-only blocks' upper bounds fall below the threshold and
the cursor skips them wholesale (the scalable analogue of the reference's
sampled inline-suffix narrowing, ``lib/suffix_array_reader.rb:224-292``,
minus its disabled buggy block alignment)."""

import numpy as np

from fatespark.codec import delta_encode_ids, encode_u32s
from fatespark.oracle import idf as idf_fn
from fatespark.wand import TermBlocks, score_bmw_or, score_exhaustive_or

BLOCK = 32


def _blocks_of(idf, docs, tfs, dls, avgdl):
    """TermBlocks with ENCODED buffers (lazy decode path), block size 32."""
    docs = np.asarray(docs, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    nb = (docs.size + BLOCK - 1) // BLOCK
    first, last, ns, max_tf, min_dl = [], [], [], [], []
    ed, et, el = [], [], []
    for i in range(nb):
        a, b = i * BLOCK, min((i + 1) * BLOCK, docs.size)
        first.append(docs[a]); last.append(docs[b - 1]); ns.append(b - a)
        max_tf.append(int(tfs[a:b].max())); min_dl.append(int(dls[a:b].min()))
        ed.append(delta_encode_ids(docs[a:b]))
        et.append(encode_u32s(tfs[a:b]))
        el.append(encode_u32s(dls[a:b]))
    return TermBlocks(idf, first, last, ns, max_tf, min_dl, ed, et, el,
                      avgdl=avgdl)


def _scenario(avgdl=100.0, n_common=10_000, n_rare=10):
    n_docs = n_common
    common_docs = np.arange(n_common, dtype=np.int64)
    # rare docs land EARLY in doc order so the heap threshold rises past the
    # common term's block upper bound within the first few blocks — from
    # there on, every common-only block is provably skippable
    rare_docs = (100 + np.arange(n_rare, dtype=np.int64) * BLOCK)
    mk = lambda: {  # fresh lazily-decodable streams per scorer run
        "common": _blocks_of(idf_fn(n_docs, n_common), common_docs,
                             np.ones(n_common), np.full(n_common, 100),
                             avgdl),
        "rare": _blocks_of(idf_fn(n_docs, n_rare), rare_docs,
                           np.full(n_rare, 10), np.full(n_rare, 100),
                           avgdl),
    }
    return mk


def test_wand_prunes_common_term_blocks():
    mk = _scenario()
    s1, s2 = mk(), mk()
    # ascending-key order parity with the engine (sorted by term)
    w_docs, w_scores = score_bmw_or([s1["common"], s1["rare"]], 100.0, k=5)
    e_docs, e_scores = score_exhaustive_or([s2["common"], s2["rare"]],
                                           100.0, k=5)
    assert list(w_docs) == list(e_docs)
    assert list(w_scores) == list(e_scores)
    common = s1["common"]
    total_blocks = len(common.ns)
    decoded = len(common._cache)
    assert total_blocks == (10_000 + BLOCK - 1) // BLOCK
    # the pruning claim: the vast majority of common-term blocks untouched
    assert decoded < total_blocks * 0.2, (decoded, total_blocks)


def test_wand_decodes_everything_when_nothing_dominates():
    """Sanity inversion: two equal common terms give no pruning headroom —
    the skip structure must not skip what it cannot prove skippable."""
    mk = _scenario(n_rare=10)
    s1 = mk()
    docs, scores = score_bmw_or([s1["common"]], 100.0, k=10_000)
    assert docs.size == 10_000  # k covers everything: no block prunable
    # every posting must have been decoded and scored (the bulk path
    # bypasses the per-block cache, so assert the semantics, not the
    # cache): the returned doc set is exactly the term's full doc set
    all_docs = s1["common"].decode_all()[0]
    assert set(docs.tolist()) == set(all_docs.tolist())
