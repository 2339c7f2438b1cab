"""PForDelta codec (``fatespark/pfor.py``): frame round-trips, the hybrid
size bound vs varint, and end-to-end engine parity — an index built with
``codec='pfor'`` must return bit-identical results to a varint index of the
same corpus on every query surface (count, AND, OR, WAND, phrase, prefix,
local reader, vacuum)."""

import numpy as np
import pytest

from fatespark.codec import encode_grouped, get_codec
from fatespark.pfor import (
    PForPostingCodec,
    bit_lengths,
    pfor_decode,
    pfor_decode_concat,
    pfor_encode_grouped,
)


class TestBitLengths:
    def test_golden(self):
        v = np.array([0, 1, 2, 3, 255, 256, 2**32 - 1, 2**32, 2**63,
                      2**64 - 1], dtype=np.uint64)
        assert list(bit_lengths(v)) == [0, 1, 2, 2, 8, 9, 32, 33, 64, 64]


class TestFrameRoundTrip:
    def test_golden_small(self):
        v = np.array([5, 1, 1, 2, 1000000, 1], dtype=np.uint64)
        st = np.array([0, 4], dtype=np.int64)
        bufs = pfor_encode_grouped(v, st)
        assert len(bufs) == 2
        assert (pfor_decode(bufs[0], 4) == v[:4]).all()
        assert (pfor_decode(bufs[1], 2) == v[4:]).all()

    def test_all_zero_and_max(self):
        for arr, st in [
            (np.zeros(10, np.uint64), np.array([0, 3, 8])),
            (np.full(16, 7, np.uint64), np.array([0, 8])),
            (np.array([2**64 - 1], np.uint64), np.array([0])),
            (np.array([0, 2**64 - 1] * 64, np.uint64), np.array([0])),
        ]:
            ns = np.diff(np.append(st, arr.size))
            got = pfor_decode_concat(pfor_encode_grouped(arr, st), ns)
            assert (got == arr).all()

    @pytest.mark.parametrize("seed", range(8))
    def test_property_mixed_groups(self, seed):
        rng = np.random.default_rng(seed)
        G = int(rng.integers(1, 40))
        glens = rng.integers(1, 200, G)
        vals = []
        for L in glens:
            first = np.uint64(rng.integers(0, 2**63, dtype=np.int64)) | (
                np.uint64(rng.integers(0, 2)) << np.uint64(63))
            gaps = rng.zipf(1.3, int(L) - 1).astype(np.uint64) \
                if L > 1 else np.zeros(0, np.uint64)
            vals.append(np.concatenate(([first], gaps)))
        flat = np.concatenate(vals).astype(np.uint64)
        starts = np.zeros(G, dtype=np.int64)
        np.cumsum(glens[:-1], out=starts[1:])
        bufs = pfor_encode_grouped(flat, starts)
        assert len(bufs) == G
        back = pfor_decode_concat(bufs, glens, int(glens.sum()))
        assert (back == flat).all()

    def test_hybrid_never_much_worse_than_varint(self):
        """The fallback branch guarantees <= varint + 1 byte per frame."""
        rng = np.random.default_rng(3)
        st = np.arange(300, dtype=np.int64) * 128
        for dist in (rng.zipf(1.2, 300 * 128),
                     rng.geometric(1 / 1200, 300 * 128),
                     rng.integers(60, 200, 300 * 128)):
            a = dist.astype(np.uint64)
            pf = sum(map(len, pfor_encode_grouped(a, st)))
            vi = sum(map(len, encode_grouped(a, st)))
            assert pf <= vi + st.size

    def test_wins_on_concentrated_values(self):
        """tfs-like (tiny) and dls-like (narrow-range) arrays must pack
        materially smaller than varint — the point of the codec."""
        rng = np.random.default_rng(4)
        st = np.arange(200, dtype=np.int64) * 128
        tfs = np.minimum(rng.zipf(2.5, 200 * 128), 50).astype(np.uint64)
        dls = rng.integers(60, 200, 200 * 128).astype(np.uint64)
        for a, ratio in ((tfs, 0.6), (dls, 0.8)):
            pf = sum(map(len, pfor_encode_grouped(a, st)))
            vi = sum(map(len, encode_grouped(a, st)))
            assert pf < ratio * vi


class TestCodecRegistry:
    def test_resolve(self):
        assert get_codec("pfor") is PForPostingCodec
        assert get_codec(None).name == "varint"
        assert get_codec(PForPostingCodec) is PForPostingCodec
        with pytest.raises(ValueError):
            get_codec("zstd")

    def test_decode_ids_matches_varint_semantics(self):
        ids = np.sort(np.array([-(2**62), -5, 3, 2**61], dtype=np.int64))
        from fatespark.codec import _i64_to_u64_ordered
        u = _i64_to_u64_ordered(ids)
        gaps = np.empty_like(u)
        gaps[0:1] = u[0:1]
        gaps[1:] = u[1:] - u[:-1]
        st = np.array([0], dtype=np.int64)
        for name in ("varint", "pfor"):
            c = get_codec(name)
            buf = c.encode_grouped(gaps, st)[0]
            assert (c.decode_ids(buf, 4) == ids).all()


N = 300


@pytest.fixture(scope="module")
def both(spark, tmp_root):
    """The same corpus indexed under each codec."""
    from fatespark.build import BuildConfig, IndexBuilder
    from fatespark.corpus import pages_df
    from fatespark.query import SearchIndex
    corpus = pages_df(spark, N, partitions=4)
    out = {}
    for name in ("varint", "pfor"):
        d = str(tmp_root / f"codec_{name}_idx")
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=1, block_size=32,
                                    codec=name)).build(spark, corpus)
        out[name] = (d, SearchIndex(spark, d))
    return out


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


class TestEngineParity:
    def test_meta_records_codec(self, both):
        assert both["pfor"][1].codec_name == "pfor"
        assert both["varint"][1].codec_name == "varint"

    def test_counts_equal(self, both):
        v, p = both["varint"][1], both["pfor"][1]
        for t in ("the", "smith", "zyzzyva", "fat_entry"):
            assert v.count(t) == p.count(t), t
            assert v.count_occurrences(t) == p.count_occurrences(t), t

    def test_search_bit_identical(self, both):
        v, p = both["varint"][1], both["pfor"][1]
        cases = [(["the", "smith"], "AND", False),
                 (["smith", "jones"], "OR", False),
                 (["the", "smith", "jones"], "OR", True)]
        for q, mode, wand in cases:
            assert _rows(v.search(q, k=10, mode=mode, use_wand=wand)) == \
                _rows(p.search(q, k=10, mode=mode, use_wand=wand)), (q, mode)

    def test_phrase_and_prefix(self, both):
        v, p = both["varint"][1], both["pfor"][1]
        assert _rows(v.search_phrase("big array", k=10)) == \
            _rows(p.search_phrase("big array", k=10))
        assert _rows(v.search_prefix("fa", k=10)) == \
            _rows(p.search_prefix("fa", k=10))

    def test_local_reader(self, both, spark):
        from fatespark.build import BuildConfig, IndexBuilder
        from fatespark.local import LocalSearchIndex
        d, p = both["pfor"]
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=1, block_size=32,
                                    codec="pfor")).compact_local(spark)
        lidx = LocalSearchIndex(d)
        assert lidx.codec_name == "pfor"
        got = lidx.search(["the", "smith"], k=10, mode="AND")
        want = _rows(p.search(["the", "smith"], k=10, mode="AND"))
        assert [(int(r.doc_id), float(r.score))
                for r in got.itertuples()] == want

    def test_vacuum_preserves_codec(self, both, spark):
        from fatespark.build import BuildConfig, IndexBuilder
        from fatespark.query import SearchIndex
        d, p = both["pfor"]
        victims = [r["doc_id"] for r in
                   p.search(["smith"], k=3, mode="OR").collect()]
        b = IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=1,
                                        block_size=32, codec="pfor"))
        b.delete_docs(spark, victims)
        b.vacuum(spark)
        idx2 = SearchIndex(spark, d)
        assert idx2.codec_name == "pfor"
        got = {r["doc_id"] for r in
               idx2.search(["smith"], k=20, mode="OR").collect()}
        assert not (got & set(victims))

    def test_pfor_index_smaller(self, both):
        """On the synthetic pages corpus the pfor posting files must not be
        larger than varint's (tfs/dls frames dominate the win)."""
        import glob
        import os
        sizes = {}
        for name, (d, _) in both.items():
            sizes[name] = sum(
                os.path.getsize(f) for f in
                glob.glob(os.path.join(d, "postings", "**", "*.parquet"),
                          recursive=True))
        assert sizes["pfor"] <= sizes["varint"]
