"""PForDelta (NewPFD-style) posting-block codec, numpy-vectorized.

Published background: PFOR/PFOR-DELTA from Zukowski, Heman, Nes & Boncz,
"Super-Scalar RAM-CPU Cache Compression" (ICDE 2006); the patched-exception
variant with per-block width selection follows NewPFD from Yan, Ding & Suel,
"Inverted Index Compression and Query Processing with Optimized Document
Ordering" (WWW 2009). The varint-fallback hybrid for short tail-term lists
is standard practice in Lucene-family engines.

The north rule names "varint/PForDelta compression"; ``codec.py`` provides
the delta+varint stream codec, this module the patched frame-of-reference
alternative for the MERGED index's posting blocks (``merge.py`` emits fixed
``block_size``-doc blocks — each block's docs/tfs/dls array is one PFor
frame). The reference's analogue surface is the raw uint32 suffix dump it
never compressed (``lib/suffix_array_writer.rb:96-99``).

Frame layout (one buffer per block; value count ``n`` travels out-of-band in
the block row, like the varint codec):

    byte 0         width b in bits (0..64), or 0xFF = varint-fallback frame
    varint         n_exceptions                       (absent in fallback)
    packed         ceil(n/8)*8 * b / 8 bytes — each value's low b bits,
                   value-major, little-endian bit order, zero-padded to a
                   multiple of 8 values so every frame is byte-aligned
    varint * n_exc exception positions within the block (delta-encoded)
    varint * n_exc exception high parts (value >> b)

Width selection per block: evaluate the exact encoded size at three bitlen
percentiles (NewPFD's ~90% coverage heuristic plus 75% and max) and take the
cheapest; if plain varint beats the best PFor frame (typical for tail-term
blocks with a handful of huge doc-id gaps), emit a fallback frame instead.
The PFor cost estimate is an UPPER bound on the emitted frame size (exact
header and high-part varints; exception-position deltas bounded by their
absolute-position varints, exact for block_size <= 128), so an emitted
hybrid frame is never larger than the varint alternative.

Encode is vectorized across ALL blocks of a batch (grouped reduceat stats,
width-class-batched bit packing); the only per-block Python is the final
buffer assembly, the same pattern as ``codec.encode_grouped``.
"""

from __future__ import annotations

import numpy as np

from .codec import (
    PostingCodec,
    varint_byte_lengths,
    varint_decode,
    varint_encode,
)

_FALLBACK = 0xFF
_U1 = np.uint64(1)
_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_PCTS = (0.75, 0.9, 1.0)


def bit_lengths(v: np.ndarray) -> np.ndarray:
    """Exact per-value bit length of a uint64 array (0 for 0)."""
    v = np.ascontiguousarray(v, dtype=np.uint64)
    hi = (v >> np.uint64(32)).astype(np.uint32)
    lo = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    def bl32(x: np.ndarray) -> np.ndarray:
        # float64 is exact below 2^53, so the frexp exponent IS the bitlen
        return np.frexp(x.astype(np.float64))[1].astype(np.int64)

    return np.where(hi > 0, 32 + bl32(hi), bl32(lo))


def _scalar_varint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        out.append(b | (0x80 if x else 0))
        if not x:
            return bytes(out)


def _grouped_byte_slices(values: np.ndarray,
                         starts: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                                      np.ndarray]:
    """Varint-encode a flat stream once; return (byte buffer, per-group byte
    start, per-group byte end). Unlike ``codec.encode_grouped`` this is
    tolerant of EMPTY groups (repeated/terminal start indices)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        z = np.zeros(starts.size, dtype=np.int64)
        return np.zeros(0, dtype=np.uint8), z, z
    buf = np.frombuffer(varint_encode(v), dtype=np.uint8)
    ends_b = np.cumsum(varint_byte_lengths(v))
    gstart = np.where(starts > 0, ends_b[np.maximum(starts - 1, 0)], 0)
    gend = np.empty(starts.size, dtype=np.int64)
    gend[:-1] = gstart[1:]
    gend[-1] = ends_b[-1]
    return buf, gstart.astype(np.int64), gend


def pfor_encode_grouped(values: np.ndarray,
                        group_starts: np.ndarray) -> list[bytes]:
    """Drop-in for ``codec.encode_grouped``: one hybrid PFor/varint frame per
    group. Groups must be non-empty (merge blocks always are)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    gs = np.asarray(group_starts, dtype=np.int64)
    G = gs.size
    if v.size == 0 or G == 0:
        return []
    glens = np.diff(np.append(gs, v.size))
    if (glens <= 0).any():
        raise ValueError("pfor_encode_grouped: empty group")
    gid = np.repeat(np.arange(G, dtype=np.int64), glens)
    nb = bit_lengths(v)

    # ---- candidate widths at bitlen percentiles, exact cost per candidate --
    order = np.lexsort((nb, gid))
    nb_sorted = nb[order]
    cand_b = np.empty((len(_PCTS), G), dtype=np.int64)
    for ci, pct in enumerate(_PCTS):
        pick = gs + np.clip(np.ceil(pct * glens).astype(np.int64) - 1,
                            0, glens - 1)
        cand_b[ci] = nb_sorted[pick]
    n8 = ((glens + 7) // 8) * 8
    pos_in_grp = np.arange(v.size, dtype=np.int64) - np.repeat(gs, glens)
    # upper bound on each value's exception-POSITION cost: the positions are
    # delta-encoded and deltas never exceed the absolute in-block position,
    # so varint_len(delta) <= varint_len(pos) — exact for block_size <= 128
    pos_vlen = varint_byte_lengths(pos_in_grp.astype(np.uint64))
    cost = np.empty((len(_PCTS), G), dtype=np.int64)
    for ci in range(len(_PCTS)):
        bv = cand_b[ci][gid]
        excess = np.maximum(nb - bv, 0)
        is_exc = excess > 0
        # an exception costs its high-part varint + its position varint
        exc_bytes = np.where(is_exc, (excess + 6) // 7 + pos_vlen, 0)
        n_exc_ci = np.add.reduceat(is_exc.astype(np.int64), gs)
        # header: width byte + exact varint of n_exceptions
        hdr = 1 + np.maximum((bit_lengths(n_exc_ci.astype(np.uint64)) + 6)
                             // 7, 1)
        cost[ci] = (hdr + n8 * cand_b[ci] // 8
                    + np.add.reduceat(exc_bytes, gs))
    best = np.argmin(cost, axis=0)
    b_grp = cand_b[best, np.arange(G)]
    pfor_cost = cost[best, np.arange(G)]

    # ---- hybrid: plain varint where it wins --------------------------------
    vlen = varint_byte_lengths(v)
    varint_cost = 1 + np.add.reduceat(vlen, gs)
    use_varint = varint_cost <= pfor_cost
    b_grp = np.where(use_varint, 0, b_grp)  # don't pack fallback groups

    b_val = b_grp[gid]
    exc = nb > b_val
    exc &= ~use_varint[gid]
    n_exc_grp = np.add.reduceat(exc.astype(np.int64), gs)

    # ---- packed section: scatter low bits into a global byte stream --------
    pb_len = np.where(use_varint, 0, n8 * b_grp // 8)
    pb_start = np.zeros(G, dtype=np.int64)
    np.cumsum(pb_len[:-1], out=pb_start[1:])
    packed = np.zeros(int(pb_len.sum()), dtype=np.uint8)
    for b in np.unique(b_grp[(~use_varint) & (b_grp > 0)]):
        b = int(b)
        sel = (b_grp == b) & ~use_varint
        if not sel.any():
            continue
        # padded values of the selected groups, concatenated
        sel_val = sel[gid]
        n8_sel = n8[sel]
        m = int(n8_sel.sum())
        padded = np.zeros(m, dtype=np.uint64)
        ps = np.zeros(sel.sum(), dtype=np.int64)
        np.cumsum(n8_sel[:-1], out=ps[1:])
        # index of each selected value inside the padded concatenation
        sel_gid_compact = np.cumsum(sel) - 1          # group -> compact idx
        padded[ps[sel_gid_compact[gid[sel_val]]] + pos_in_grp[sel_val]] = \
            v[sel_val] & ((_U1 << np.uint64(b)) - _U1 if b < 64 else _U64MAX)
        bits = ((padded[:, None] >> np.arange(b, dtype=np.uint64)) & _U1
                ).astype(np.uint8)
        pk = np.packbits(bits.reshape(-1), bitorder="little")  # m*b/8, exact
        # scatter each group's packed bytes to its slice of `packed`
        lens_sel = (n8_sel * b // 8).astype(np.int64)
        tstart = pb_start[sel]
        within = np.arange(int(lens_sel.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(lens_sel) - lens_sel, lens_sel)
        packed[np.repeat(tstart, lens_sel) + within] = pk

    # ---- exception streams (delta positions, high parts) -------------------
    exc_stream_starts = np.zeros(G, dtype=np.int64)
    np.cumsum(n_exc_grp[:-1], out=exc_stream_starts[1:])
    exc_pos = pos_in_grp[exc].astype(np.uint64)
    if exc_pos.size:
        gaps = np.empty_like(exc_pos)
        gaps[0:1] = exc_pos[0:1]
        gaps[1:] = exc_pos[1:] - exc_pos[:-1]
        ne_starts = exc_stream_starts[n_exc_grp > 0]
        gaps[ne_starts] = exc_pos[ne_starts]
    else:
        gaps = exc_pos
    shift = np.minimum(b_val[exc], 63).astype(np.uint64)  # b<64 where exc
    highs = v[exc] >> shift
    posb, pos_s, pos_e = _grouped_byte_slices(gaps, exc_stream_starts)
    highb, high_s, high_e = _grouped_byte_slices(highs, exc_stream_starts)

    # ---- varint-fallback payloads ------------------------------------------
    vbuf, v_s, v_e = _grouped_byte_slices(v, gs)

    out: list[bytes] = []
    pb = packed.tobytes()
    posbb, highbb, vbb = posb.tobytes(), highb.tobytes(), vbuf.tobytes()
    for g in range(G):
        if use_varint[g]:
            out.append(b"\xff" + vbb[v_s[g]:v_e[g]])
        else:
            out.append(bytes([int(b_grp[g])])
                       + _scalar_varint(int(n_exc_grp[g]))
                       + pb[pb_start[g]:pb_start[g] + pb_len[g]]
                       + posbb[pos_s[g]:pos_e[g]]
                       + highbb[high_s[g]:high_e[g]])
    return out


def pfor_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode one frame back to the uint64 value array (length ``n``)."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    b = int(raw[0])
    if b == _FALLBACK:
        return varint_decode(raw[1:].tobytes(), n)
    i, n_exc, shift = 1, 0, 0
    while True:
        byte = int(raw[i])
        n_exc |= (byte & 0x7F) << shift
        i += 1
        shift += 7
        if not byte & 0x80:
            break
    n8 = ((n + 7) // 8) * 8
    pb = n8 * b // 8
    vals = np.zeros(n8, dtype=np.uint64)
    if b:
        bits = np.unpackbits(raw[i:i + pb], bitorder="little").reshape(n8, b)
        for k in range(b):
            vals |= bits[:, k].astype(np.uint64) << np.uint64(k)
    vals = vals[:n]
    i += pb
    if n_exc:
        rest = varint_decode(raw[i:].tobytes(), 2 * n_exc)
        pos = np.cumsum(rest[:n_exc], dtype=np.uint64).astype(np.int64)
        vals[pos] |= rest[n_exc:] << np.uint64(b)
    return vals


def pfor_decode_concat(bufs: list[bytes], ns: np.ndarray,
                       total: int | None = None) -> np.ndarray:
    """Decode many frames -> one flat uint64 stream (per-frame counts are
    required — PFor frames are not self-delimiting the way LEB128 is)."""
    parts = [pfor_decode(bb, int(n)) for bb, n in zip(bufs, ns)]
    out = np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint64)
    if total is not None and out.size != total:
        raise ValueError(f"pfor_decode_concat: expected {total}, "
                         f"got {out.size}")
    return out


class PForPostingCodec(PostingCodec):
    name = "pfor"
    encode_grouped = staticmethod(pfor_encode_grouped)

    @staticmethod
    def decode(buf: bytes, n: int) -> np.ndarray:
        return pfor_decode(buf, n)

    @staticmethod
    def decode_concat(bufs: list[bytes], ns,
                      total: int | None = None) -> np.ndarray:
        return pfor_decode_concat(list(bufs), ns, total)
