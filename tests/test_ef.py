"""Elias-Fano codec (``fatespark/ef.py``): frame round-trips, the hybrid
size bound vs varint, the uint64-wrap fallback, and end-to-end engine
parity — an index built with ``codec='ef'`` must return bit-identical
results to a varint index of the same corpus on every query surface
(count, AND, OR, WAND, phrase, prefix, local reader, vacuum)."""

import numpy as np
import pytest

from fatespark.codec import _i64_to_u64_ordered, encode_grouped, get_codec
from fatespark.ef import (
    EliasFanoPostingCodec,
    ef_decode,
    ef_decode_concat,
    ef_encode_grouped,
)


class TestFrameRoundTrip:
    def test_golden_small(self):
        v = np.array([5, 1, 1, 2, 1000000, 1], dtype=np.uint64)
        st = np.array([0, 4], dtype=np.int64)
        bufs = ef_encode_grouped(v, st)
        assert len(bufs) == 2
        assert (ef_decode(bufs[0], 4) == v[:4]).all()
        assert (ef_decode(bufs[1], 2) == v[4:]).all()

    def test_zero_values_and_singletons(self):
        for arr, st in [
            (np.zeros(10, np.uint64), np.array([0, 3, 8])),
            (np.full(16, 7, np.uint64), np.array([0, 8])),
            (np.array([0], np.uint64), np.array([0])),
            (np.array([2**62], np.uint64), np.array([0])),
        ]:
            ns = np.diff(np.append(st, arr.size))
            got = ef_decode_concat(ef_encode_grouped(arr, st), ns)
            assert (got == arr).all()

    def test_uint64_wrap_falls_back(self):
        """Prefix sums past 2^64 can't be EF-coded — the varint fallback
        must keep the frame lossless."""
        for arr in (np.array([2**64 - 1], np.uint64),
                    np.array([2**63, 2**63, 5], np.uint64),
                    np.array([0, 2**64 - 1] * 4, np.uint64)):
            st = np.array([0], dtype=np.int64)
            bufs = ef_encode_grouped(arr, st)
            assert bufs[0][0] == 0xFF
            assert (ef_decode(bufs[0], arr.size) == arr).all()

    @pytest.mark.parametrize("seed", range(8))
    def test_property_mixed_groups(self, seed):
        rng = np.random.default_rng(seed)
        G = int(rng.integers(1, 40))
        glens = rng.integers(1, 200, G)
        vals = []
        for L in glens:
            first = np.uint64(rng.integers(0, 2**62, dtype=np.int64))
            gaps = rng.zipf(1.3, int(L) - 1).astype(np.uint64) \
                if L > 1 else np.zeros(0, np.uint64)
            vals.append(np.concatenate(([first], gaps)))
        flat = np.concatenate(vals).astype(np.uint64)
        starts = np.zeros(G, dtype=np.int64)
        np.cumsum(glens[:-1], out=starts[1:])
        bufs = ef_encode_grouped(flat, starts)
        assert len(bufs) == G
        back = ef_decode_concat(bufs, glens, int(glens.sum()))
        assert (back == flat).all()

    @pytest.mark.parametrize("seed", range(4))
    def test_concat_matches_per_frame_decode(self, seed):
        """The batch-vectorized decode_concat must equal frame-at-a-time
        ef_decode on a mix of EF and fallback frames."""
        rng = np.random.default_rng(100 + seed)
        G = int(rng.integers(2, 30))
        glens = rng.integers(1, 150, G)
        vals = []
        for gi, L in enumerate(glens):
            if gi % 3 == 2:  # every third group: huge sparse gaps -> fallback
                vals.append(rng.integers(2**40, 2**60, int(L),
                                         dtype=np.int64).astype(np.uint64))
            else:
                first = np.uint64(rng.integers(0, 2**62, dtype=np.int64))
                gaps = rng.integers(1, 9, int(L) - 1).astype(np.uint64) \
                    if L > 1 else np.zeros(0, np.uint64)
                vals.append(np.concatenate(([first], gaps)))
        flat = np.concatenate(vals).astype(np.uint64)
        starts = np.zeros(G, dtype=np.int64)
        np.cumsum(glens[:-1], out=starts[1:])
        bufs = ef_encode_grouped(flat, starts)
        per_frame = np.concatenate(
            [ef_decode(b, int(n)) for b, n in zip(bufs, glens)])
        batched = ef_decode_concat(bufs, glens, int(glens.sum()))
        assert (batched == per_frame).all()
        assert (batched == flat).all()

    def test_hybrid_never_much_worse_than_varint(self):
        """The fallback branch guarantees <= varint + 1 byte per frame."""
        rng = np.random.default_rng(3)
        st = np.arange(300, dtype=np.int64) * 128
        for dist in (rng.zipf(1.2, 300 * 128),
                     rng.geometric(1 / 1200, 300 * 128),
                     rng.integers(60, 200, 300 * 128)):
            a = dist.astype(np.uint64)
            ef = sum(map(len, ef_encode_grouped(a, st)))
            vi = sum(map(len, encode_grouped(a, st)))
            assert ef <= vi + st.size

    def test_wins_on_dense_doc_gaps(self):
        """Dense head-term blocks (small gaps over a wide id range) are
        EF's home turf: ~2 + log2(u/n) bits/el vs varint's 8+ bits/el."""
        rng = np.random.default_rng(4)
        st = np.arange(200, dtype=np.int64) * 128
        gaps = rng.integers(1, 8, 200 * 128).astype(np.uint64)
        ef = sum(map(len, ef_encode_grouped(gaps, st)))
        vi = sum(map(len, encode_grouped(gaps, st)))
        assert ef < 0.7 * vi


class TestCodecRegistry:
    def test_resolve(self):
        assert get_codec("ef") is EliasFanoPostingCodec
        assert get_codec(EliasFanoPostingCodec) is EliasFanoPostingCodec

    def test_decode_ids_matches_varint_semantics(self):
        ids = np.sort(np.array([-(2**62), -5, 3, 2**61], dtype=np.int64))
        u = _i64_to_u64_ordered(ids)
        gaps = np.empty_like(u)
        gaps[0:1] = u[0:1]
        gaps[1:] = u[1:] - u[:-1]
        st = np.array([0], dtype=np.int64)
        for name in ("varint", "ef"):
            c = get_codec(name)
            buf = c.encode_grouped(gaps, st)[0]
            assert (c.decode_ids(buf, 4) == ids).all()

    def test_decode_ids_ef_frame_direct_path(self):
        """A frame the size heuristic keeps in EF form must take the
        mono-direct decode_ids path and still match varint semantics."""
        ids = np.arange(1000, 1512, 4, dtype=np.int64)
        u = _i64_to_u64_ordered(ids)
        gaps = np.empty_like(u)
        gaps[0:1] = u[0:1]
        gaps[1:] = u[1:] - u[:-1]
        st = np.array([0], dtype=np.int64)
        buf = EliasFanoPostingCodec.encode_grouped(gaps, st)[0]
        assert buf[0] != 0xFF  # genuinely EF-coded
        assert (EliasFanoPostingCodec.decode_ids(buf, ids.size) == ids).all()


N = 300


@pytest.fixture(scope="module")
def both(spark, tmp_root):
    """The same corpus indexed under each codec."""
    from fatespark.build import BuildConfig, IndexBuilder
    from fatespark.corpus import pages_df
    from fatespark.query import SearchIndex
    corpus = pages_df(spark, N, partitions=4)
    out = {}
    for name in ("varint", "ef"):
        d = str(tmp_root / f"efcodec_{name}_idx")
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=1, block_size=32,
                                    codec=name)).build(spark, corpus)
        out[name] = (d, SearchIndex(spark, d))
    return out


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


class TestEngineParity:
    def test_meta_records_codec(self, both):
        assert both["ef"][1].codec_name == "ef"
        assert both["varint"][1].codec_name == "varint"

    def test_counts_equal(self, both):
        v, p = both["varint"][1], both["ef"][1]
        for t in ("the", "smith", "zyzzyva", "fat_entry"):
            assert v.count(t) == p.count(t), t
            assert v.count_occurrences(t) == p.count_occurrences(t), t

    def test_search_bit_identical(self, both):
        v, p = both["varint"][1], both["ef"][1]
        cases = [(["the", "smith"], "AND", False),
                 (["smith", "jones"], "OR", False),
                 (["the", "smith", "jones"], "OR", True)]
        for q, mode, wand in cases:
            assert _rows(v.search(q, k=10, mode=mode, use_wand=wand)) == \
                _rows(p.search(q, k=10, mode=mode, use_wand=wand)), (q, mode)

    def test_phrase_and_prefix(self, both):
        v, p = both["varint"][1], both["ef"][1]
        assert _rows(v.search_phrase("big array", k=10)) == \
            _rows(p.search_phrase("big array", k=10))
        assert _rows(v.search_prefix("fa", k=10)) == \
            _rows(p.search_prefix("fa", k=10))

    def test_local_reader(self, both, spark):
        from fatespark.build import BuildConfig, IndexBuilder
        from fatespark.local import LocalSearchIndex
        d, p = both["ef"]
        IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=1, block_size=32,
                                    codec="ef")).compact_local(spark)
        lidx = LocalSearchIndex(d)
        assert lidx.codec_name == "ef"
        got = lidx.search(["the", "smith"], k=10, mode="AND")
        want = _rows(p.search(["the", "smith"], k=10, mode="AND"))
        assert [(int(r.doc_id), float(r.score))
                for r in got.itertuples()] == want

    def test_vacuum_preserves_codec(self, both, spark):
        from fatespark.build import BuildConfig, IndexBuilder
        from fatespark.query import SearchIndex
        d, p = both["ef"]
        victims = [r["doc_id"] for r in
                   p.search(["smith"], k=3, mode="OR").collect()]
        b = IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=1,
                                        block_size=32, codec="ef"))
        b.delete_docs(spark, victims)
        b.vacuum(spark)
        idx2 = SearchIndex(spark, d)
        assert idx2.codec_name == "ef"
        got = {r["doc_id"] for r in
               idx2.search(["smith"], k=20, mode="OR").collect()}
        assert not (got & set(victims))
