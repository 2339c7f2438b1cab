"""Pure-numpy baseline-sequential JPEG codec (ITU-T T.81).

No codec library exists in this container, so BOTH directions are
implemented from the spec: a baseline encoder (used by tests and the
deterministic payload generators — real JPEG files need a real encoder)
and the decoder that closes the repo's last gated multimodal path
(``multimodal.decode_image`` previously raised for JPEG pixels).

Scope — exactly ITU-T T.81 baseline sequential DCT, 8-bit:

* markers: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/RSTn/EOI; multi-table DQT
  and DHT segments; 8- and 16-bit quant tables on decode
* entropy: interleaved Huffman MCU scan, byte stuffing (FF 00), DC
  prediction per component, restart intervals resetting prediction
* frame: 1-4 components, sampling factors 1-2 (4:4:4, 4:2:2, 4:2:0),
  partial edge MCUs (encoder pads by edge replication, decoder crops)
* IDCT/FDCT: orthonormal separable 8x8 DCT-II as two float64 matrix
  products — bit-deterministic across platforms for integer inputs

Loudly out of scope (``NotImplementedError``, never a wrong answer):
progressive (SOF2) and every non-baseline frame type, arithmetic
coding (DAC), 12-bit precision, DNL.

Determinism contract (the reason this is hand-rolled rather than
"pillow if available"): for images whose pixels are CONSTANT within
each aligned 8x8 tile, encoding with unit (all-ones) quant tables is
EXACT — a flat block has one integer DCT coefficient (DC = 8*(v-128))
and no AC, so decode returns the source pixels bit-for-bit, and a SQL
twin can compute pixel statistics in closed form from the generator.
Arbitrary content round-trips within quantization error (tested).

Reference provenance: fates has no binary media handling at all
(`lib/` is text CSV indexing); this module belongs to the
training-data multimodal tier the brief adds on top.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["jpeg_encode", "jpeg_decode", "ycbcr_to_rgb", "rgb_to_ycbcr",
           "QUANT_LUMA", "QUANT_CHROMA"]

# ---------------------------------------------------------------------------
# constant tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

# Annex K "typical" Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal DCT-II basis: C[k, n] = a_k cos((2n+1) k pi / 16)
_N = np.arange(8, dtype=np.float64)
_DCT = np.cos((2.0 * _N[None, :] + 1.0) * _N[:, None] * np.pi / 16.0)
_DCT[0, :] *= 1.0 / np.sqrt(2.0)
_DCT *= 0.5
_IDCT = _DCT.T.copy()


def _fdct(block: np.ndarray) -> np.ndarray:
    """8x8 forward DCT of a level-shifted float64 block."""
    return _DCT @ block @ _DCT.T


def _idct(coef: np.ndarray) -> np.ndarray:
    """8x8 inverse DCT -> float64 spatial block (before level shift)."""
    return _IDCT @ coef @ _IDCT.T


def _huff_codes(bits, vals):
    """T.81 C.2: canonical (value -> (code, length)) assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits, vals):
    """(min_code, max_code, val_index) arrays per length, T.81 F.2.2.3."""
    mincode = np.zeros(17, dtype=np.int64)
    maxcode = np.full(17, -1, dtype=np.int64)
    valptr = np.zeros(17, dtype=np.int64)
    code = 0
    k = 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            valptr[length] = k
            mincode[length] = code
            code += n
            maxcode[length] = code - 1
            k += n
        code <<= 1
    return mincode, maxcode, valptr, np.asarray(vals, dtype=np.int64)


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)   # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)   # pad with 1-bits (T.81 F.1.2.3)


class _BitReader:
    """Reads the entropy-coded segment: destuffs FF 00, stops AT any other
    marker (the caller handles RST/EOI)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None   # set when a non-stuffed marker is reached

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker: synthesize 0 bits (T.81 allows padding before
                # markers); record it for the MCU loop
                self.marker = (0xFF, nxt)
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> tuple[int, int]:
        """Skip pad bits, expect a marker next; returns (0xFF, code) and
        positions past it."""
        self.acc = 0
        self.nbits = 0
        self.marker = None
        d = self.data
        p = self.pos
        while p + 1 < len(d) and d[p] != 0xFF:
            p += 1
        if p + 1 >= len(d):
            raise ValueError("expected JPEG marker, hit EOF")
        while d[p + 1] == 0xFF:   # fill bytes
            p += 1
        mk = d[p + 1]
        self.pos = p + 2
        return 0xFF, mk


def _decode_symbol(br: _BitReader, table) -> int:
    mincode, maxcode, valptr, vals = table
    code = br.bit()
    for length in range(1, 17):
        if maxcode[length] >= 0 and code <= maxcode[length]:
            return int(vals[valptr[length] + code - mincode[length]])
        code = (code << 1) | br.bit()
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a size-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    """Smallest size with v representable (T.81 F.1.2.1.2)."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# color transforms (JFIF / BT.601 full-range, integer-rounded)
# ---------------------------------------------------------------------------

def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y = px[..., 0].astype(np.float64)
    cb = px[..., 1].astype(np.float64) - 128.0
    cr = px[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _quant_tables(quality):
    """quality None -> unit tables (the exactness contract); else the
    Annex K tables scaled by the libjpeg quality convention."""
    if quality is None:
        one = np.ones((8, 8), dtype=np.int64)
        return one, one
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lt = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255)
    ct = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return lt.astype(np.int64), ct.astype(np.int64)


def _encode_block(bw: _BitWriter, coef_q: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    """Huffman-encode one quantized 8x8 block; returns the new DC pred."""
    zz = coef_q.reshape(-1)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, length = dc_codes[size]
    bw.put(code, length)
    if size:
        mag = diff if diff >= 0 else diff + (1 << size) - 1
        bw.put(mag, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            if i > last_nz:
                break
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]   # ZRL
            bw.put(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        bw.put(code, length)
        mag = v if v >= 0 else v + (1 << size) - 1
        bw.put(mag, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]   # EOB
        bw.put(code, length)
    return dc


def _plane_blocks(plane: np.ndarray, bx: int, by: int) -> np.ndarray:
    """8x8 block at block-coords (bx, by), edge-replicated past bounds."""
    h, w = plane.shape
    ys = np.minimum(np.arange(by * 8, by * 8 + 8), h - 1)
    xs = np.minimum(np.arange(bx * 8, bx * 8 + 8), w - 1)
    return plane[np.ix_(ys, xs)]


def jpeg_encode(px: np.ndarray, quality=None,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode u8 pixels to a baseline-sequential JFIF byte stream.

    ``px``: (h, w) grayscale or (h, w, 3) RGB. ``quality`` None uses
    UNIT quant tables (exact for 8x8-tile-constant content — module
    docstring); 1-100 scales the Annex K tables (libjpeg convention).
    ``subsampling``: '444' | '422' | '420' (color only).
    """
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    lt, ct = _quant_tables(quality)
    if gray:
        comps = [("Y", px.astype(np.float64), 1, 1, 0)]
    else:
        if px.shape[2] != 3:
            raise ValueError("expected RGB")
        ycc = rgb_to_ycbcr(px)
        hs, vs = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
        y = ycc[..., 0].astype(np.float64)
        cb = ycc[..., 1].astype(np.float64)
        cr = ycc[..., 2].astype(np.float64)
        if hs > 1 or vs > 1:
            # box-filter downsample with edge padding to a multiple
            ph = (h + vs - 1) // vs * vs
            pw = (w + hs - 1) // hs * hs
            def down(p):
                pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return pad.reshape(ph // vs, vs, pw // hs, hs).mean(
                    axis=(1, 3))
            cb, cr = down(cb), down(cr)
        comps = [("Y", y, hs, vs, 0), ("Cb", cb, 1, 1, 1),
                 ("Cr", cr, 1, 1, 1)]
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    out = bytearray()
    out += b"\xff\xd8"                                    # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    def dqt(tid, tbl):
        zz = tbl.reshape(-1)[ZIGZAG]
        return (b"\xff\xdb" + struct.pack(">H", 67)
                + bytes([tid]) + bytes(int(v) for v in zz))
    out += dqt(0, lt)
    if not gray:
        out += dqt(1, ct)
    # SOF0
    nf = len(comps)
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * nf) \
        + struct.pack(">BHHB", 8, h, w, nf)
    for i, (_n, _p, chs, cvs, tq) in enumerate(comps):
        out += bytes([i + 1, (chs << 4) | cvs, tq])
    # DHT
    def dht(tc, tid, spec):
        bits, vals = spec
        return (b"\xff\xc4"
                + struct.pack(">H", 19 + len(vals))
                + bytes([(tc << 4) | tid]) + bytes(bits)
                + bytes(vals))
    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if not gray:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nf) + bytes([nf])
    for i in range(nf):
        td_ta = 0x00 if i == 0 else 0x11
        out += bytes([i + 1, td_ta])
    out += bytes([0, 63, 0])

    dc_l = _huff_codes(*_DC_LUMA)
    ac_l = _huff_codes(*_AC_LUMA)
    dc_c = _huff_codes(*_DC_CHROMA)
    ac_c = _huff_codes(*_AC_CHROMA)
    bw = _BitWriter()
    preds = [0] * nf
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.buf
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * nf
            for ci, (_n, plane, chs, cvs, tq) in enumerate(comps):
                qt = lt if tq == 0 else ct
                dc_t = dc_l if ci == 0 else dc_c
                ac_t = ac_l if ci == 0 else ac_c
                for by in range(cvs):
                    for bx in range(chs):
                        blk = _plane_blocks(plane, mx * chs + bx,
                                            my * cvs + by)
                        coef = _fdct(blk - 128.0)
                        cq = np.round(coef / qt).astype(np.int64)
                        preds[ci] = _encode_block(bw, cq, preds[ci],
                                                  dc_t, ac_t)
            mcu_count += 1
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"                                    # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def jpeg_decode(buf: bytes):
    """Decode a baseline-sequential JPEG -> (w, h, planes, sampling).

    ``planes``: list of u8 component arrays at NATIVE resolution (chroma
    stays subsampled — callers upsample if they need co-sited values);
    ``sampling``: list of (h_factor, v_factor) per component. Grayscale
    gives one plane. Raises NotImplementedError for progressive (SOF2)
    / non-baseline frames, arithmetic coding, 12-bit precision.
    """
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple, tuple] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = buf[pos + 1]
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", buf, pos + 2)
        seg = buf[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:                                 # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    zz = np.frombuffer(seg, np.uint8, 64, p).astype(
                        np.int64)
                    p += 64
                else:
                    zz = np.frombuffer(seg, ">u2", 64, p).astype(np.int64)
                    p += 128
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                qtabs[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:                               # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                htabs[(tc, th)] = _huff_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xDD:                               # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xC0 or marker == 0xC1:             # SOF0/1 baseline
            prec, fh, fw, nf = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            comps = []
            for i in range(nf):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fw, fh, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            kinds = {0xC2: "progressive DCT", 0xC3: "lossless",
                     0xC9: "arithmetic sequential",
                     0xCA: "arithmetic progressive"}
            raise NotImplementedError(
                f"JPEG frame type {marker:#x} "
                f"({kinds.get(marker, 'non-baseline')}) — baseline "
                f"sequential only")
        elif marker == 0xCC:
            raise NotImplementedError("arithmetic coding (DAC)")
        elif marker == 0xDA:                               # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomp = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scomp.append((cs, tdta >> 4, tdta & 0x0F))
            data_pos = pos + 2 + seglen
            return _decode_scan(buf, data_pos, frame, scomp, qtabs,
                                htabs, restart_interval)
        pos += 2 + seglen
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(buf, pos, frame, scomp, qtabs, htabs, restart_interval):
    fw, fh, comps = frame
    byid = {cid: (chs, cvs, tq) for cid, chs, cvs, tq in comps}
    hmax = max(chs for _, chs, _, _ in comps)
    vmax = max(cvs for _, _, cvs, _ in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    planes = []
    sampling = []
    meta = []
    for cid, td, ta in scomp:
        chs, cvs, tq = byid[cid]
        pw, ph = mcux * chs * 8, mcuy * cvs * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))
        sampling.append((chs, cvs))
        meta.append((chs, cvs, qtabs[tq], htabs[(0, td)], htabs[(1, ta)]))
    br = _BitReader(buf, pos)
    preds = [0] * len(scomp)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                _, mk = br.align_to_marker()
                if not (0xD0 <= mk <= 0xD7):
                    raise ValueError(f"expected RST, got {mk:#x}")
                br = _BitReader(buf, br.pos)
                preds = [0] * len(scomp)
            for ci, (chs, cvs, qt, dct_, act_) in enumerate(meta):
                for by in range(cvs):
                    for bx in range(chs):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _decode_symbol(br, dct_)
                        diff = _extend(br.bits(s), s)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, act_)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break            # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * qt.reshape(-1)[ZIGZAG]
                        sp = _idct(coef.reshape(8, 8)) + 128.0
                        y0 = (my * cvs + by) * 8
                        x0 = (mx * chs + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = sp
            mcu_count += 1
    out = []
    for ci, p in enumerate(planes):
        chs, cvs = sampling[ci]
        cw = (fw * chs + hmax - 1) // hmax
        ch = (fh * cvs + vmax - 1) // vmax
        out.append(np.clip(np.round(p[:ch, :cw]), 0, 255).astype(np.uint8))
    return fw, fh, out, sampling
