"""Per-partition inverted-index segment build (the map side of the index).

Spark shape: one ``mapInPandas`` over the corpus — tokenize each Arrow batch,
aggregate (term, doc) -> (tf, positions) vectorized in numpy, and emit one
compressed segment row per (bucket, term, salt) per batch. All heavy work is
C-level (regex findall, factorize, lexsort, vectorized varint); the only
Python-level loop is one cheap buffer slice per emitted group.

This is the Spark-native analogue of the reference's fragment build
(``lib/fragment_writer.rb`` + ``lib/suffix_array_writer.rb:59-120``): where
fates sorts one global suffix array on a single machine, we pre-aggregate and
compress map-side so the single shuffle (the merge) moves ~1 byte/posting
instead of raw token streams.

Memory is bounded by the Arrow batch size (no cross-batch accumulation), so
executors never hold more than one batch of postings — the property that lets
the same code run on a 1000-executor cluster at 100 TB.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from .analysis import ANALYZERS, ascii_fold
from .codec import encode_grouped, segmented_delta
from .ids import bucket_of, salt_of, u64o

SEGMENT_SCHEMA = (
    "bucket int, term string, field int, salt int, n long, sum_tf long, "
    "max_tf int, min_dl int, docs binary, tfs binary, dls binary, poss binary"
)

SEGMENT_COLS = ["bucket", "term", "field", "salt", "n", "sum_tf", "max_tf",
                "min_dl", "docs", "tfs", "dls", "poss"]


def _empty_segments() -> pd.DataFrame:
    return pd.DataFrame({
        "bucket": pd.array([], dtype="int32"),
        "term": pd.array([], dtype=object),
        "field": pd.array([], dtype="int32"),
        "salt": pd.array([], dtype="int32"),
        "n": pd.array([], dtype="int64"),
        "sum_tf": pd.array([], dtype="int64"),
        "max_tf": pd.array([], dtype="int32"),
        "min_dl": pd.array([], dtype="int32"),
        "docs": pd.array([], dtype=object),
        "tfs": pd.array([], dtype=object),
        "dls": pd.array([], dtype=object),
        "poss": pd.array([], dtype=object),
    })


def segment_rows_pandas(doc_ids: np.ndarray, texts: list[str], *,
                        n_buckets: int, salt_bits: int = 0,
                        analyzer: str = "whitespace",
                        store_positions: bool = True,
                        field_id: int = 0) -> pd.DataFrame:
    """Build segment rows for one batch of ONE field (``field_id`` emitted as
    a constant column; multi-field corpora call this once per field per batch
    — same single scan). Pure pandas/numpy — unit-testable locally and
    wrapped by ``build_segments`` for the cluster."""
    tok, _ = ANALYZERS[analyzer]
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    toks_per_doc = [tok(ascii_fold(t) if t is not None else "") for t in texts]
    lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64,
                       count=len(toks_per_doc))
    total = int(lens.sum())
    if total == 0:
        return _empty_segments()

    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in toks_per_doc
                                 if t]) if total else np.array([], dtype=object)
    codes, uniq_terms = pd.factorize(flat_terms, sort=False)
    doc_idx = np.repeat(np.arange(doc_ids.size, dtype=np.int64), lens)
    ends = np.cumsum(lens)
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(ends - lens, lens)

    d_u = u64o(doc_ids)[doc_idx]
    b = bucket_of(doc_ids, n_buckets)[doc_idx]
    s = salt_of(doc_ids, salt_bits)[doc_idx]

    # sort tokens by (term, bucket, salt, doc, pos); bucket/salt are
    # doc-functions so docs stay contiguous and doc-sorted inside groups
    order = np.lexsort((pos_in_doc, d_u, s, b, codes))
    codes, b, s, d_u = codes[order], b[order], s[order], d_u[order]
    pos_sorted = pos_in_doc[order]
    doc_idx = doc_idx[order]

    # (term,bucket,salt,doc) run boundaries -> per-posting tf
    new_doc = np.empty(total, dtype=bool)
    new_doc[0] = True
    new_doc[1:] = (codes[1:] != codes[:-1]) | (d_u[1:] != d_u[:-1])
    doc_starts = np.flatnonzero(new_doc)
    tfs = np.diff(np.append(doc_starts, total))
    p_docs = d_u[doc_starts]
    p_codes = codes[doc_starts]
    p_b = b[doc_starts]
    p_s = s[doc_starts]
    p_dls = lens[doc_idx[doc_starts]]

    # (term,bucket,salt) group boundaries over the posting stream
    new_grp = np.empty(p_codes.size, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (p_codes[1:] != p_codes[:-1]) | (p_b[1:] != p_b[:-1]) | (
        p_s[1:] != p_s[:-1])
    grp_starts = np.flatnonzero(new_grp)
    grp_ends = np.append(grp_starts[1:], p_codes.size)
    grp_sizes = grp_ends - grp_starts

    docs_enc = encode_grouped(segmented_delta(p_docs, grp_starts), grp_starts)
    tfs_enc = encode_grouped(tfs.astype(np.uint64), grp_starts)
    dls_enc = encode_grouped(p_dls.astype(np.uint64), grp_starts)
    if store_positions:
        pos_gaps = segmented_delta(pos_sorted.astype(np.uint64), doc_starts)
        # group boundaries in token space
        tok_grp_starts = doc_starts[grp_starts]
        poss_enc = encode_grouped(pos_gaps, tok_grp_starts)
    else:
        poss_enc = [b"" for _ in range(grp_starts.size)]

    # per-group aggregates, vectorized via reduceat
    sum_tf = np.add.reduceat(tfs, grp_starts)
    max_tf = np.maximum.reduceat(tfs, grp_starts)
    min_dl = np.minimum.reduceat(p_dls, grp_starts)

    return pd.DataFrame({
        "bucket": p_b[grp_starts].astype(np.int32),
        "term": uniq_terms[p_codes[grp_starts]],
        "field": np.full(grp_starts.size, field_id, dtype=np.int32),
        "salt": p_s[grp_starts].astype(np.int32),
        "n": grp_sizes.astype(np.int64),
        "sum_tf": sum_tf.astype(np.int64),
        "max_tf": max_tf.astype(np.int32),
        "min_dl": min_dl.astype(np.int32),
        "docs": docs_enc,
        "tfs": tfs_enc,
        "dls": dls_enc,
        "poss": poss_enc,
    })


def build_segments(df, *, n_buckets: int, salt_bits: int = 0,
                   analyzer: str = "whitespace", store_positions: bool = True,
                   id_col: str = "doc_id", text_col: str = "text",
                   text_cols: list[str] | None = None,
                   analyzers: list[str] | None = None):
    """corpus DataFrame -> segments DataFrame (one narrow mapInPandas stage,
    no shuffle). ``text_cols`` indexes several fields in the SAME scan
    (field_id = position, reference's positional field identity,
    ``lib/fulltext_writer.rb:51-55``); ``analyzers`` optionally names one
    analyzer per field (parallel array, like the reference's)."""
    cols = text_cols if text_cols is not None else [text_col]
    anas = analyzers if analyzers is not None else [analyzer] * len(cols)
    if len(anas) != len(cols):
        raise ValueError("analyzers must parallel text_cols")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(np.int64)
            for fid, (col, ana) in enumerate(zip(cols, anas)):
                out = segment_rows_pandas(
                    ids, list(pdf[col]),
                    n_buckets=n_buckets, salt_bits=salt_bits, analyzer=ana,
                    store_positions=store_positions, field_id=fid)
                if len(out):
                    yield out

    return df.select(id_col, *cols).mapInPandas(gen, schema=SEGMENT_SCHEMA)


def decode_segment_row(row) -> dict:
    """Decode one segment/block row back to numpy arrays (tests/merge)."""
    from .codec import decode_positions, decode_u32s, delta_decode_ids
    n = int(row["n"])
    tfs = decode_u32s(row["tfs"], n)
    poss = row["poss"]
    return {
        "docs": delta_decode_ids(row["docs"], n),
        "tfs": tfs,
        "dls": decode_u32s(row["dls"], n),
        "poss": decode_positions(poss, tfs) if poss else None,
    }
