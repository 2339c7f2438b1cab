"""Pure-python/numpy GIF codec (GIF87a/89a) — closes the last gated
pixel path in the multimodal tier (``multimodal.decode_image`` previously
raised for GIF pixels; JPEG was closed by ``fatespark.jpeg``).

Both directions are implemented from the spec (no codec library exists in
this container, so tests need the encoder):

* ``gif_decode``: logical screen descriptor, global AND local color
  tables, Graphic Control Extension (transparency index, frame delay),
  every extension skipped by sub-block walking, variable-code-size LZW
  decompression (clear/EOI codes, code growth to 12 bits), interlaced
  row de-shuffling (the 8/8/4/2 four-pass scheme), multi-frame streams
  (returns every frame + its (left, top) placement — disposal
  compositing is the caller's policy).
* ``gif_encode``: grayscale or paletted single-frame GIF89a with a real
  LZW compressor (dictionary rebuild on clear, 12-bit cap), optional
  interlace — round trips are EXACT (GIF is lossless), so any content
  hash-checks.

Scale shape: per-image work is O(bytes) with the LZW inner loop in
python over CODES (not pixels — each code emits a whole dictionary
string via one numpy slice copy); images ride ``mapInPandas`` batches
like every other multimodal decode. Reference analogue: none (fates
indexes CSV text); this is the training-data multimodal tier.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["gif_encode", "gif_decode"]

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, n_expected: int
                ) -> np.ndarray:
    """Variable-width LZW (GIF flavor) -> uint8 index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary as (prefix_code, last_byte); roots are (-1, i)
    prefix = np.full(4096, -1, dtype=np.int32)
    last = np.zeros(4096, dtype=np.uint8)
    lengths = np.zeros(4096, dtype=np.int32)
    for i in range(clear):
        last[i] = i
        lengths[i] = 1

    out = np.empty(n_expected + 4096, dtype=np.uint8)
    n_out = 0

    def emit(code: int) -> int:
        """Write code's string; returns its FIRST byte."""
        nonlocal n_out
        ln = lengths[code]
        pos = n_out + ln
        n_out = pos
        c = code
        while c >= 0:
            pos -= 1
            out[pos] = last[c]
            c = prefix[c]
        return int(out[n_out - ln])

    code_size = min_code_size + 1
    next_code = eoi + 1
    acc = 0
    nbits = 0
    prev = -1
    i = 0
    nd = len(data)
    while True:
        while nbits < code_size:
            if i >= nd:
                return out[:n_out]      # truncated stream: best effort
            acc |= data[i] << nbits     # GIF is LSB-first
            nbits += 8
            i += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            code_size = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            return out[:n_out]
        if prev < 0:
            if code >= next_code:
                raise ValueError("GIF LZW: first code not a root")
            emit(code)
            prev = code
            continue
        if code < next_code:
            first = emit(code)
        elif code == next_code:
            # KwKwK case: string = prev's string + its first byte
            ln = lengths[prev]
            pos0 = n_out
            emit(prev)
            first = out[pos0]
            out[n_out] = first
            n_out += 1
        else:
            raise ValueError("GIF LZW: code out of range")
        if next_code < 4096:
            prefix[next_code] = prev
            last[next_code] = first
            lengths[next_code] = lengths[prev] + 1
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code


def _lzw_encode(ix: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW compressor (dict rebuild on clear, 12-bit cap)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict = {(-1, int(v)): int(v) for v in range(clear)}
    code_size = min_code_size + 1
    next_code = eoi + 1
    put(clear, code_size)
    prev = -1
    for v in ix.tolist():
        key = (prev, v)
        got = table.get(key)
        if got is not None:
            prev = got
            continue
        put(prev, code_size)
        if next_code < 4096:
            table[key] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            put(clear, code_size)
            table = {(-1, int(r)): int(r) for r in range(clear)}
            code_size = min_code_size + 1
            next_code = eoi + 1
        prev = v
    if prev >= 0:
        put(prev, code_size)
    put(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("GIF sub-blocks truncated")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += buf[pos:pos + n]
        pos += n


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def gif_encode(px: np.ndarray, palette: np.ndarray | None = None,
               interlace: bool = False) -> bytes:
    """Encode a single-frame GIF89a. ``px``: (h, w) uint8 — palette
    INDICES if ``palette`` (n, 3) is given, else gray values with an
    identity 256-gray palette. Lossless: decode returns ``px`` exactly."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape
    if palette is None:
        palette = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, 1)
    palette = np.asarray(palette, dtype=np.uint8)
    n = len(palette)
    depth = max(1, int(n - 1).bit_length())
    size = 1 << depth
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0])
    out += pal.tobytes()
    ilace = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([ilace])
    if interlace:
        rows = np.concatenate([np.arange(s, h, step)
                               for s, step in _INTERLACE_PASSES])
        ix = px[rows].reshape(-1)
    else:
        ix = px.reshape(-1)
    mcs = max(2, depth)
    out += bytes([mcs]) + _sub_blocks(_lzw_encode(ix, mcs))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def gif_decode(buf: bytes):
    """Decode a GIF -> (w, h, frames). Each frame is a dict with
    ``ix`` (h_f, w_f) uint8 palette indices, ``rgb`` (h_f, w_f, 3) uint8,
    ``left``/``top`` placement, ``transparent`` index (or None) and
    ``delay_cs`` (centiseconds). Interlaced frames come back in display
    row order. Animation compositing/disposal is the caller's policy."""
    if len(buf) < 13 or buf[:4] != b"GIF8" or buf[4:6] not in (b"7a",
                                                               b"9a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", buf, 6)
    flags = buf[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    frames = []
    transparent = None
    delay_cs = 0
    while pos < len(buf):
        b0 = buf[pos]
        pos += 1
        if b0 == 0x3B:                       # trailer
            break
        if b0 == 0x21:                       # extension
            label = buf[pos]
            pos += 1
            data, pos = _read_sub_blocks(buf, pos)
            if label == 0xF9 and len(data) >= 4:   # GCE
                gflags = data[0]
                delay_cs = struct.unpack_from("<H", data, 1)[0]
                transparent = data[3] if gflags & 0x01 else None
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown GIF block {b0:#x}")
        left, top, fw, fh = struct.unpack_from("<HHHH", buf, pos)
        pos += 8
        iflags = buf[pos]
        pos += 1
        pal = gct
        if iflags & 0x80:                    # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF frame has no color table")
        mcs = buf[pos]
        pos += 1
        data, pos = _read_sub_blocks(buf, pos)
        ix = _lzw_decode(data, mcs, fw * fh)
        if len(ix) < fw * fh:
            raise ValueError("GIF pixel data truncated")
        ix = ix[:fw * fh].reshape(fh, fw)
        if iflags & 0x40:                    # interlaced: de-shuffle rows
            rows = np.concatenate([np.arange(s, fh, step)
                                   for s, step in _INTERLACE_PASSES])
            d = np.empty_like(ix)
            d[rows] = ix
            ix = d
        safe = np.minimum(ix, len(pal) - 1)
        frames.append({"ix": ix, "rgb": pal[safe],
                       "left": int(left), "top": int(top),
                       "transparent": transparent,
                       "delay_cs": int(delay_cs)})
        transparent = None
        delay_cs = 0
    if not frames:
        raise ValueError("GIF has no image data")
    return int(w), int(h), frames
