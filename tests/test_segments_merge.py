"""Segment build + salted merge: pure-pandas unit tests (no Spark), verified
against the BM25 oracle's in-memory postings."""

import numpy as np
import pandas as pd
import pytest

from fatespark.corpus import pages_pandas, splitmix64
from fatespark.ids import bucket_of, salt_of
from fatespark.merge import merge_group_pandas
from fatespark.oracle import BM25Oracle
from fatespark.segments import decode_segment_row, segment_rows_pandas

TEXTS = ["the cat sat on the mat", "the dog", "cat dog cat",
         "Smith smith SMITH", ""]
IDS = np.array([1, 2, 3, 4, 5], dtype=np.int64)


def test_segments_match_oracle_postings():
    seg = segment_rows_pandas(IDS, TEXTS, n_buckets=1, salt_bits=0)
    oracle = BM25Oracle(list(zip(IDS.tolist(), TEXTS)))
    assert set(seg["term"]) == set(oracle.postings)
    for _, row in seg.iterrows():
        dec = decode_segment_row(row)
        exp = oracle.postings[row["term"]]
        assert dec["docs"].tolist() == sorted(exp)
        assert dec["tfs"].tolist() == [len(exp[d]) for d in sorted(exp)]
        assert dec["dls"].tolist() == [oracle.doclen[d] for d in sorted(exp)]
        exp_pos = [p for d in sorted(exp) for p in exp[d]]
        assert dec["poss"].tolist() == exp_pos


def test_segments_empty_and_null_text():
    seg = segment_rows_pandas(np.array([1], dtype=np.int64), [None],
                              n_buckets=2)
    assert len(seg) == 0
    seg2 = segment_rows_pandas(np.array([], dtype=np.int64), [], n_buckets=2)
    assert len(seg2) == 0


def test_bucket_and_salt_routing():
    ids = splitmix64(np.arange(1000, dtype=np.uint64)).view(np.int64)
    b = bucket_of(ids, 8)
    assert b.min() >= 0 and b.max() < 8
    # roughly uniform
    counts = np.bincount(b, minlength=8)
    assert counts.min() > 60
    s = salt_of(ids, 2)
    assert set(np.unique(s)) <= {0, 1, 2, 3}
    # salts are doc-RANGE splits: ordering by (salt, doc) == ordering by doc
    order = np.lexsort((ids, s))
    from fatespark.ids import u64o
    assert np.array_equal(u64o(ids[order]), np.sort(u64o(ids)))


def test_merge_blocks_match_oracle():
    """Split the corpus into 3 'partitions', merge, compare vs oracle."""
    pdf = pages_pandas(np.arange(60, dtype=np.uint64))
    ids = splitmix64(np.arange(1, 61, dtype=np.uint64)).view(np.int64)
    texts = list(pdf["text"])
    oracle = BM25Oracle(list(zip(ids.tolist(), texts)))
    parts = [segment_rows_pandas(ids[i::3], texts[i::3], n_buckets=1,
                                 salt_bits=0) for i in range(3)]
    seg = pd.concat(parts, ignore_index=True)
    for term in ["the", "smith", "of"]:
        grp = seg[seg["term"] == term]
        blocks = merge_group_pandas(grp, block_size=4)
        docs = np.concatenate([decode_segment_row(r)["docs"]
                               for _, r in blocks.iterrows()])
        tfs = np.concatenate([decode_segment_row(r)["tfs"]
                              for _, r in blocks.iterrows()])
        exp = oracle.postings[term]
        from fatespark.ids import u64o
        order = np.argsort(u64o(np.array(sorted(exp), dtype=np.int64)))
        exp_docs = np.array(sorted(exp), dtype=np.int64)[order]
        assert docs.tolist() == exp_docs.tolist()
        assert tfs.tolist() == [len(exp[d]) for d in exp_docs.tolist()]
        # block metadata invariants
        assert (blocks["n"] <= 4).all()
        assert (blocks["first_doc"].to_numpy() <= blocks["last_doc"].to_numpy()).all()


def test_merge_duplicate_detection():
    seg1 = segment_rows_pandas(IDS[:3], TEXTS[:3], n_buckets=1)
    seg2 = segment_rows_pandas(IDS[:3], TEXTS[:3], n_buckets=1)  # same docs!
    grp = pd.concat([seg1[seg1.term == "the"], seg2[seg2.term == "the"]],
                    ignore_index=True)
    with pytest.raises(ValueError, match="duplicate doc_ids"):
        merge_group_pandas(grp)


def test_merge_positions_preserved_across_runs():
    texts = ["x a x", "a x a a", "x x x a"]
    ids = np.array([30, 10, 20], dtype=np.int64)
    parts = [segment_rows_pandas(ids[i:i + 1], texts[i:i + 1], n_buckets=1)
             for i in range(3)]
    grp = pd.concat([p[p.term == "a"] for p in parts], ignore_index=True)
    blocks = merge_group_pandas(grp, block_size=2)
    oracle = BM25Oracle(list(zip(ids.tolist(), texts)))
    decoded = [decode_segment_row(r) for _, r in blocks.iterrows()]
    docs = np.concatenate([d["docs"] for d in decoded]).tolist()
    poss = np.concatenate([d["poss"] for d in decoded]).tolist()
    assert docs == [10, 20, 30]
    assert poss == [0, 2, 3] + [3] + [1]  # per-doc positions of 'a'
    assert oracle.postings["a"] == {10: [0, 2, 3], 20: [3], 30: [1]}
