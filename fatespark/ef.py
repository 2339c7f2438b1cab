"""Elias-Fano posting-block codec, numpy-vectorized.

Published background: the quasi-succinct inverted-index representation of
Vigna, "Quasi-Succinct Indices" (WSDM 2013), building on Elias (1974) and
Fano (1971); the same encoding backs Lucene 8+ doc-id blocks and the PISA
engine's single-level Elias-Fano lists. EF stores a monotone non-decreasing
sequence m_0 <= ... <= m_{n-1} < u in at most ``2 + ceil(log2(u/n))`` bits
per element: the low ``l = max(0, floor(log2(u/n)))`` bits of every value
packed contiguously, and the high parts as a unary-gap bitvector (bit
``(m_i >> l) + i`` set for each i).

The merged index's block streams are non-negative (doc-id gaps, tfs, dls
— ``merge.py:181-184``), so each block encodes the EF of its PREFIX SUMS:
for the docs stream that monotone sequence IS the block's absolute
(u64-ordered) doc ids — the textbook use — and for tfs/dls it is their
running totals, which stay tiny. Decode returns first differences, i.e. the
original values, keeping the codec a drop-in for ``codec.encode_grouped``
exactly like ``pfor.py``. ``decode_ids`` is overridden to skip the
diff-then-cumsum round-trip: the decoded monotone sequence is mapped to
int64 doc ids directly.

Frame layout (one buffer per block; value count ``n`` travels out-of-band
in the block row, like the varint and PFor codecs):

    byte 0    low-bit width l (0..63), or 0xFF = varint-fallback frame
    varint    base = m_0, the block's first prefix sum — for the docs
              stream that is the block's absolute first doc id, which
              sits anywhere in u64 space; EF codes the REBASED sequence
              m_i - m_0 (so its universe is the block-local id range,
              not the corpus id space)
    packed    ceil(n/8)*8 * l / 8 bytes — each rebased prefix-sum's low
              l bits, value-major, little-endian bit order, zero-padded
              to a multiple of 8 values so every frame is byte-aligned
    bitvector ceil((((m_last - m_0) >> l) + n) / 8) bytes — the high-part
              unary bitvector, little-endian bit order, zero-padded

The fallback frame (plain varints of the original values) is emitted when
it is smaller — tail-term blocks whose single huge doc-id gap makes u/n
enormous — and whenever the block's prefix sums would wrap uint64 (only
reachable with adversarial >=2^63 inputs, never by real posting streams).
Both costs are computed exactly, so every emitted frame is the smaller of
the two encodings.

Encode is vectorized across ALL blocks of a batch (segmented prefix sums,
width-class-batched low-bit packing, one global scatter + packbits for the
high bitvectors); the only per-block Python is the final buffer assembly,
the same pattern as ``codec.encode_grouped`` and ``pfor.py``.

Reference analogue: the raw uint32 suffix dump fates never compressed
(``lib/suffix_array_writer.rb:96-99``); codec choice rides
``BuildConfig(codec="ef")`` and the self-describing index ``meta`` row.
"""

from __future__ import annotations

import numpy as np

from .codec import (
    PostingCodec,
    _u64_to_i64_ordered,
    segmented_cumsum_u64,
    segmented_delta,
    varint_byte_lengths,
    varint_decode,
)
from .pfor import _grouped_byte_slices, _scalar_varint, bit_lengths

_FALLBACK = 0xFF
_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def ef_encode_grouped(values: np.ndarray,
                      group_starts: np.ndarray) -> list[bytes]:
    """Drop-in for ``codec.encode_grouped``: one hybrid EF/varint frame per
    group. Groups must be non-empty (merge blocks always are)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    gs = np.asarray(group_starts, dtype=np.int64)
    G = gs.size
    if v.size == 0 or G == 0:
        return []
    glens = np.diff(np.append(gs, v.size))
    if (glens <= 0).any():
        raise ValueError("ef_encode_grouped: empty group")
    gid = np.repeat(np.arange(G, dtype=np.int64), glens)
    pos_in_grp = np.arange(v.size, dtype=np.int64) - np.repeat(gs, glens)

    mono = segmented_cumsum_u64(v, gs)
    last = gs + glens - 1
    m_last = mono[last]

    # uint64 wrap detection: values are non-negative, so the true prefix
    # sums are non-decreasing — any in-group decrease means a wrap (each
    # step adds < 2^64, so a wrapped sum lands strictly below its
    # predecessor). Wrapped groups take the varint fallback.
    dec = np.zeros(v.size, dtype=np.int64)
    dec[1:] = (mono[1:] < mono[:-1]).astype(np.int64)
    dec[gs] = 0
    overflow = np.add.reduceat(dec, gs) > 0

    # ---- rebase on each block's first prefix sum ---------------------------
    m_first = mono[gs]
    with np.errstate(over="ignore"):
        mono_rel = mono - m_first[gid]  # exact for non-wrapped groups
    m_span = m_last - m_first  # relative universe - 1
    overflow |= m_span == _U64MAX  # u = m_span + 1 would wrap

    # ---- per-group low width l = max(0, floor(log2(u/n))), exact costs ----
    n_u = glens.astype(np.uint64)
    ratio = (m_span + np.uint64(1)) // n_u  # m_span < 2^64-1 (wrap flagged)
    l_grp = np.maximum(bit_lengths(ratio) - 1, 0)  # bitlen-1 = floor(log2)
    n8 = ((glens + 7) // 8) * 8
    low_bytes = n8 * l_grp // 8
    hb_bytes = (((m_span >> l_grp.astype(np.uint64)).astype(np.int64)
                 + glens) + 7) // 8
    base_bytes = varint_byte_lengths(m_first).astype(np.int64)
    ef_cost = 1 + base_bytes + low_bytes + hb_bytes

    vlen = varint_byte_lengths(v)
    varint_cost = 1 + np.add.reduceat(vlen, gs)
    use_varint = overflow | (varint_cost <= ef_cost)
    l_grp = np.where(use_varint, 0, l_grp)

    # ---- packed low bits: width-class-batched, like pfor.py ---------------
    pb_len = np.where(use_varint, 0, low_bytes)
    pb_start = np.zeros(G, dtype=np.int64)
    np.cumsum(pb_len[:-1], out=pb_start[1:])
    packed = np.zeros(int(pb_len.sum()), dtype=np.uint8)
    for l in np.unique(l_grp[(~use_varint) & (l_grp > 0)]):
        l = int(l)
        sel = (l_grp == l) & ~use_varint
        sel_val = sel[gid]
        n8_sel = n8[sel]
        padded = np.zeros(int(n8_sel.sum()), dtype=np.uint64)
        ps = np.zeros(int(sel.sum()), dtype=np.int64)
        np.cumsum(n8_sel[:-1], out=ps[1:])
        sel_gid_compact = np.cumsum(sel) - 1
        padded[ps[sel_gid_compact[gid[sel_val]]] + pos_in_grp[sel_val]] = \
            mono_rel[sel_val] & ((np.uint64(1) << np.uint64(l)) - np.uint64(1))
        bits = ((padded[:, None] >> np.arange(l, dtype=np.uint64))
                & np.uint64(1)).astype(np.uint8)
        pk = np.packbits(bits.reshape(-1), bitorder="little")
        lens_sel = (n8_sel * l // 8).astype(np.int64)
        within = np.arange(int(lens_sel.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(lens_sel) - lens_sel, lens_sel)
        packed[np.repeat(pb_start[sel], lens_sel) + within] = pk

    # ---- high-part unary bitvectors: one global scatter + packbits --------
    hb_len = np.where(use_varint, 0, hb_bytes)
    hb_start = np.zeros(G, dtype=np.int64)
    np.cumsum(hb_len[:-1], out=hb_start[1:])
    bits = np.zeros(int(hb_len.sum()) * 8, dtype=np.uint8)
    sel_val = ~use_varint[gid]
    if sel_val.any():
        p = (mono_rel >> l_grp.astype(np.uint64)[gid]).astype(np.int64) \
            + pos_in_grp
        bits[(hb_start[gid] * 8 + p)[sel_val]] = 1
    highs = np.packbits(bits, bitorder="little") if bits.size else \
        np.zeros(0, dtype=np.uint8)

    # ---- varint-fallback payloads ------------------------------------------
    vbuf, v_s, v_e = _grouped_byte_slices(v, gs)

    out: list[bytes] = []
    pb, hbb, vbb = packed.tobytes(), highs.tobytes(), vbuf.tobytes()
    for g in range(G):
        if use_varint[g]:
            out.append(b"\xff" + vbb[v_s[g]:v_e[g]])
        else:
            out.append(bytes([int(l_grp[g])])
                       + _scalar_varint(int(m_first[g]))
                       + pb[pb_start[g]:pb_start[g] + pb_len[g]]
                       + hbb[hb_start[g]:hb_start[g] + hb_len[g]])
    return out


def _ef_decode_mono(raw: np.ndarray, l: int, n: int) -> np.ndarray:
    """Decode an EF frame body (past the width byte) to its monotone
    prefix-sum sequence (base varint + rebased EF)."""
    i, base, shift = 1, 0, 0
    while True:
        byte = int(raw[i])
        base |= (byte & 0x7F) << shift
        i += 1
        shift += 7
        if not byte & 0x80:
            break
    n8 = ((n + 7) // 8) * 8
    lb = n8 * l // 8
    low = np.zeros(n8, dtype=np.uint64)
    if l:
        bits = np.unpackbits(raw[i:i + lb], bitorder="little").reshape(n8, l)
        for k in range(l):
            low |= bits[:, k].astype(np.uint64) << np.uint64(k)
    hb = np.unpackbits(raw[i + lb:], bitorder="little")
    pos = np.flatnonzero(hb)[:n].astype(np.uint64)
    h = pos - np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return (((h << np.uint64(l)) | low[:n])
                + np.uint64(base & 0xFFFFFFFFFFFFFFFF))


def ef_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode one frame back to the uint64 value array (length ``n``)."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    l = int(raw[0])
    if l == _FALLBACK:
        return varint_decode(raw[1:].tobytes(), n)
    mono = _ef_decode_mono(raw, l, n)
    out = np.empty(n, dtype=np.uint64)
    out[0] = mono[0]
    out[1:] = mono[1:] - mono[:-1]
    return out


def ef_decode_concat(bufs: list[bytes], ns: np.ndarray,
                     total: int | None = None) -> np.ndarray:
    """Decode many frames -> one flat uint64 stream (per-frame counts are
    required — EF frames are not self-delimiting the way LEB128 is).

    Batch-vectorized across frames: per-frame Python touches only the
    header byte and base varint (O(frames)); all bit unpacking happens in
    width-class-batched ``np.unpackbits`` calls and ONE global
    ``flatnonzero`` over the concatenated high bitvectors — the shape that
    keeps full-index re-reads (vacuum / compaction, ``merge.py:94-97``)
    off the per-block interpreter loop."""
    bufs = list(bufs)
    ns = np.asarray(ns, dtype=np.int64)
    F = len(bufs)
    if F == 0:
        return np.zeros(0, dtype=np.uint64)
    out_total = int(ns.sum())
    if total is not None and out_total != total:
        raise ValueError(f"ef_decode_concat: expected {total}, got "
                         f"{out_total}")
    out = np.empty(out_total, dtype=np.uint64)
    starts = np.zeros(F, dtype=np.int64)
    np.cumsum(ns[:-1], out=starts[1:])

    # ---- headers: width byte + base varint (cheap per-frame scalar) -------
    l_arr = np.zeros(F, dtype=np.int64)
    base = np.zeros(F, dtype=np.uint64)
    low_off = np.zeros(F, dtype=np.int64)
    fallback = np.zeros(F, dtype=bool)
    for i, b in enumerate(bufs):
        l = b[0]
        if l == _FALLBACK:
            fallback[i] = True
            continue
        l_arr[i] = l
        j, v, sh = 1, 0, 0
        while True:
            byte = b[j]
            v |= (byte & 0x7F) << sh
            j += 1
            sh += 7
            if not byte & 0x80:
                break
        base[i] = np.uint64(v & 0xFFFFFFFFFFFFFFFF)
        low_off[i] = j

    # ---- fallback frames: one concatenated varint decode -------------------
    if fallback.any():
        fb = np.flatnonzero(fallback)
        n_fb = ns[fb]
        vals = varint_decode(b"".join(bufs[i][1:] for i in fb),
                             int(n_fb.sum()))
        within = np.arange(vals.size, dtype=np.int64) - np.repeat(
            np.cumsum(n_fb) - n_fb, n_fb)
        out[np.repeat(starts[fb], n_fb) + within] = vals

    ef = np.flatnonzero(~fallback)
    if ef.size == 0:
        return out
    n_ef = ns[ef]
    l_ef = l_arr[ef]
    n8 = ((n_ef + 7) // 8) * 8
    lb = n8 * l_ef // 8

    # ---- low bits: width-class-batched unpack into the padded value space --
    pad_starts = np.zeros(ef.size, dtype=np.int64)
    np.cumsum(n8[:-1], out=pad_starts[1:])
    low_all = np.zeros(int(n8.sum()), dtype=np.uint64)
    for l in np.unique(l_ef[l_ef > 0]):
        sel = l_ef == l
        lowb = b"".join(bufs[ef[i]][low_off[ef[i]]:low_off[ef[i]] + lb[i]]
                        for i in np.flatnonzero(sel))
        bits = np.unpackbits(np.frombuffer(lowb, dtype=np.uint8),
                             bitorder="little").reshape(-1, int(l))
        vals = np.zeros(bits.shape[0], dtype=np.uint64)
        for k in range(int(l)):
            vals |= bits[:, k].astype(np.uint64) << np.uint64(k)
        n8_sel = n8[sel]
        within = np.arange(int(n8_sel.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(n8_sel) - n8_sel, n8_sel)
        low_all[np.repeat(pad_starts[sel], n8_sel) + within] = vals

    # ---- high bits: ONE unpack + flatnonzero over all frames ---------------
    hb_parts = [bufs[ef[i]][low_off[ef[i]] + lb[i]:]
                for i in range(ef.size)]
    hb_lens = np.fromiter((len(x) for x in hb_parts), dtype=np.int64,
                          count=ef.size)
    hb = np.unpackbits(np.frombuffer(b"".join(hb_parts), dtype=np.uint8),
                       bitorder="little")
    gpos = np.flatnonzero(hb)  # exactly n_i set bits per frame region
    hb_bit_start = np.zeros(ef.size, dtype=np.int64)
    np.cumsum(hb_lens[:-1] * 8, out=hb_bit_start[1:])
    within = np.arange(gpos.size, dtype=np.int64) - np.repeat(
        np.cumsum(n_ef) - n_ef, n_ef)
    h = (gpos - np.repeat(hb_bit_start, n_ef) - within).astype(np.uint64)
    low = low_all[np.repeat(pad_starts, n_ef) + within]
    shift = np.repeat(l_ef, n_ef).astype(np.uint64)
    with np.errstate(over="ignore"):
        mono = ((h << shift) | low) + np.repeat(base[ef], n_ef)
    ef_starts = np.zeros(ef.size, dtype=np.int64)
    np.cumsum(n_ef[:-1], out=ef_starts[1:])
    vals = segmented_delta(mono, ef_starts)
    out[np.repeat(starts[ef], n_ef) + within] = vals
    return out


class EliasFanoPostingCodec(PostingCodec):
    name = "ef"
    encode_grouped = staticmethod(ef_encode_grouped)

    @staticmethod
    def decode(buf: bytes, n: int) -> np.ndarray:
        return ef_decode(buf, n)

    @staticmethod
    def decode_concat(bufs: list[bytes], ns,
                      total: int | None = None) -> np.ndarray:
        return ef_decode_concat(list(bufs), ns, total)

    @classmethod
    def decode_ids(cls, buf: bytes, n: int) -> np.ndarray:
        """Doc ids without the diff-then-cumsum round-trip: an EF docs
        frame's monotone sequence IS the block's u64-ordered ids."""
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        raw = np.frombuffer(buf, dtype=np.uint8)
        l = int(raw[0])
        if l == _FALLBACK:
            return super().decode_ids(buf, n)
        return _u64_to_i64_ordered(_ef_decode_mono(raw, l, n))
