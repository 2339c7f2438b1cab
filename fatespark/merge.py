"""Salted segment merge — the one shuffle of the index build.

``segments.groupBy(bucket, term, salt).applyInPandas(merge)`` k-way merges the
per-partition compressed runs into final posting blocks. Because the salt is a
doc-RANGE split (``ids.salt_of``: top bits of the order-mapped doc id), the
per-salt outputs of one (bucket, term) are doc-disjoint AND globally ordered —
no second merge pass is needed even for head terms; this is the explicit
Zipf-skew handling the north rule requires (a head term like 'the' lands in
n_buckets × n_salts independent reducer groups instead of one).

Spark-native analogue of the reference's fragment merge
(``lib/fragment_writer.rb:37-43``), which only supports concatenating one
pre-sorted fragment into an empty writer; here arbitrary numbers of segments
merge, with spill handled by Spark's shuffle machinery.

Output: fixed-size posting blocks (default 128 docs) with per-block skip
metadata ``(first_doc, last_doc, max_tf, min_dl)`` — the block-max structure
the WAND scorer prunes on (the scalable analogue of fates' sampled inline
suffix index, ``lib/suffix_array_writer.rb:88-92``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .codec import (
    decode_positions,
    decode_u32s,
    delta_decode_ids,
    encode_grouped,
    segmented_delta,
)
from .ids import u64o

BLOCK_SCHEMA = (
    "bucket int, term string, block_id int, n int, first_doc long, "
    "last_doc long, sum_tf long, max_tf int, min_dl int, "
    "docs binary, tfs binary, dls binary, poss binary"
)


def merge_group_pandas(pdf: pd.DataFrame, block_size: int = 128,
                       on_duplicate: str = "error") -> pd.DataFrame:
    """Merge the segment rows of one (bucket, term, salt) group into block
    rows. Vectorized k-way merge: concatenate + argsort (runs are pre-sorted;
    numpy's mergesort on nearly-sorted data is effectively a k-way merge)."""
    n_rows = len(pdf)
    ns = pdf["n"].to_numpy(np.int64)
    docs = np.concatenate([delta_decode_ids(b, int(n))
                           for b, n in zip(pdf["docs"], ns)])
    tfs = np.concatenate([decode_u32s(b, int(n)) for b, n in zip(pdf["tfs"], ns)])
    dls = np.concatenate([decode_u32s(b, int(n)) for b, n in zip(pdf["dls"], ns)])
    has_pos = bool(pdf["poss"].iloc[0])
    if has_pos:
        pos_parts = [decode_positions(b, decode_u32s(t, int(n)))
                     for b, t, n in zip(pdf["poss"], pdf["tfs"], ns)]

    du = u64o(docs)
    order = np.argsort(du, kind="mergesort") if n_rows > 1 else np.arange(du.size)
    du = du[order]
    if du.size > 1 and np.any(du[1:] == du[:-1]):
        dup = docs[order][1:][du[1:] == du[:-1]][:5]
        if on_duplicate == "error":
            raise ValueError(
                f"duplicate doc_ids across segments (id collision or "
                f"duplicate source rows): {dup.tolist()}")
    docs, tfs, dls = docs[order], tfs[order], dls[order]

    total = docs.size
    nblocks = (total + block_size - 1) // block_size
    blk_starts = np.arange(nblocks, dtype=np.int64) * block_size
    blk_ends = np.minimum(blk_starts + block_size, total)

    docs_enc = encode_grouped(segmented_delta(u64o(docs), blk_starts), blk_starts)
    tfs_enc = encode_grouped(tfs.astype(np.uint64), blk_starts)
    dls_enc = encode_grouped(dls.astype(np.uint64), blk_starts)

    if has_pos:
        # permute variable-length per-doc position segments into merged order
        src_pos = np.concatenate(pos_parts)
        src_doc = np.repeat(np.arange(total, dtype=np.int64), tfs_unmerged := np.concatenate(
            [decode_u32s(t, int(n)) for t, n in zip(pdf["tfs"], ns)]))
        rank = np.empty(total, dtype=np.int64)
        rank[order] = np.arange(total)
        perm = np.argsort(rank[src_doc], kind="stable")
        pos_merged = src_pos[perm]
        doc_starts_tok = np.zeros(total, dtype=np.int64)
        np.cumsum(tfs[:-1], out=doc_starts_tok[1:])
        pos_gaps = segmented_delta(pos_merged.astype(np.uint64), doc_starts_tok)
        poss_enc = encode_grouped(pos_gaps, doc_starts_tok[blk_starts])
    else:
        poss_enc = [b"" for _ in range(nblocks)]

    sum_tf = np.add.reduceat(tfs, blk_starts)
    max_tf = np.maximum.reduceat(tfs, blk_starts)
    min_dl = np.minimum.reduceat(dls, blk_starts)

    return pd.DataFrame({
        "bucket": np.full(nblocks, pdf["bucket"].iloc[0], dtype=np.int32),
        "term": pdf["term"].iloc[0],
        "block_id": np.arange(nblocks, dtype=np.int32),
        "n": (blk_ends - blk_starts).astype(np.int32),
        "first_doc": docs[blk_starts],
        "last_doc": docs[blk_ends - 1],
        "sum_tf": sum_tf.astype(np.int64),
        "max_tf": max_tf.astype(np.int32),
        "min_dl": min_dl.astype(np.int32),
        "docs": docs_enc,
        "tfs": tfs_enc,
        "dls": dls_enc,
        "poss": poss_enc,
    })


def merge_segments(segments, block_size: int = 128, on_duplicate: str = "error"):
    """segments DataFrame -> posting-block DataFrame via the salted groupBy."""
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return merge_group_pandas(pdf, block_size=block_size,
                                  on_duplicate=on_duplicate)
    return segments.groupBy("bucket", "term", "salt").applyInPandas(
        fn, schema=BLOCK_SCHEMA)
