"""Minimal pure-python AVI (RIFF) demuxer + muxer — the video-container
analogue of the WAV chunk walk, closing the multimodal tier's last
container gate. fates has no media handling (`lib/` indexes CSV text);
this belongs to the training-data multimodal tier.

Scope: the classic single-video-stream AVI shape —

* ``avi_decode``: RIFF walk (``LIST hdrl`` -> ``avih`` + ``strl``/
  ``strh``/``strf``, ``LIST movi`` with ``00db``/``00dc`` chunks,
  nested ``LIST rec `` groups, word-aligned chunk padding, optional
  ``idx1`` ignored — the movi walk is authoritative). Returns stream
  metadata (dims, fps, codec fourcc, frame count) plus every frame's
  raw payload. Frames are DECODED only for the uncompressed 8-bit
  DIB case (fourcc ``DIB ``/0, biBitCount 8: bottom-up rows, 4-byte
  row alignment, palette indices) — compressed codecs come back as
  raw payloads with their fourcc so a caller can route them.
* ``avi_encode``: writes that same shape (uncompressed 8-bit DIB
  frames, gray palette) so lossless round trips are testable without
  a codec library.

Scale shape: per-file work is O(bytes); files ride ``mapInPandas``
batches like every other multimodal decode.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["avi_encode", "avi_decode", "dib8_decode"]


def _chunk(cid: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return cid + struct.pack("<I", len(data)) + data + pad


def _list(kind: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", kind + data)


def avi_encode(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """Encode (h, w) uint8 gray frames as an uncompressed 8-bit-DIB AVI
    (bottom-up rows, 4-byte-aligned, identity gray palette)."""
    if not frames:
        raise ValueError("need >= 1 frame")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share dims")
    row_bytes = (w + 3) // 4 * 4
    frame_bytes = row_bytes * h

    avih = struct.pack("<IIIIIIIIIIIIII",
                       1_000_000 // fps, frame_bytes * fps, 0, 0x10,
                       len(frames), 0, 1, frame_bytes, w, h,
                       0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII",
            0, 0, 0, 0, 1, fps, 0, len(frames), frame_bytes, 0, 0, 0)
            + struct.pack("<hhhh", 0, 0, w, h))
    # BITMAPINFOHEADER + 256-entry gray palette (BGRA quads)
    bmih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, frame_bytes,
                       0, 0, 256, 0)
    pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
    strf = bmih + pal
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_body = bytearray()
    for f in frames:
        dib = np.zeros((h, row_bytes), dtype=np.uint8)
        dib[:, :w] = f[::-1]     # bottom-up row order
        movi_body += _chunk(b"00db", dib.tobytes())
    movi = _list(b"movi", bytes(movi_body))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def dib8_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    """Uncompressed 8-bit DIB frame -> (h, w) uint8, top-down."""
    row_bytes = (w + 3) // 4 * 4
    if len(payload) < row_bytes * h:
        raise ValueError("DIB frame truncated")
    rows = np.frombuffer(payload, np.uint8,
                         count=row_bytes * h).reshape(h, row_bytes)
    return rows[::-1, :w].copy()


def _walk(buf: bytes, pos: int, end: int):
    """Yield (fourcc, list_kind_or_None, body_start, body_len); recurses
    are the caller's choice via the returned extents."""
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if cid == b"LIST" and clen >= 4:
            yield cid, buf[body:body + 4], body + 4, clen - 4
        else:
            yield cid, None, body, clen
        pos = body + clen + (clen & 1)


def avi_decode(buf: bytes):
    """-> dict(width, height, fps, n_frames, fourcc, frames, pixels).

    ``frames``: list of raw per-frame payloads (``00db``/``00dc``) in
    movi order. ``pixels``: list of decoded (h, w) uint8 arrays when the
    stream is uncompressed 8-bit DIB, else None (the raw payloads +
    fourcc still come back — a loud partial decode, never a wrong
    answer)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    end = min(len(buf), 8 + struct.unpack_from("<I", buf, 4)[0])
    w = h = None
    fps = 0
    n_frames = 0
    fourcc = b""
    bitcount = 0
    frames: list[bytes] = []

    def walk_movi(p, e):
        for cid, kind, bs, bl in _walk(buf, p, e):
            if cid == b"LIST" and kind == b"rec ":
                walk_movi(bs, bs + bl)
            elif cid[2:4] in (b"db", b"dc"):
                frames.append(buf[bs:bs + bl])

    for cid, kind, bs, bl in _walk(buf, 12, end):
        if cid != b"LIST":
            continue
        if kind == b"hdrl":
            for c2, k2, b2, l2 in _walk(buf, bs, bs + bl):
                if c2 == b"avih":
                    vals = struct.unpack_from("<14I", buf, b2)
                    us_per_frame, n_frames = vals[0], vals[4]
                    w, h = vals[8], vals[9]
                    fps = round(1_000_000 / us_per_frame) \
                        if us_per_frame else 0
                elif c2 == b"LIST" and k2 == b"strl":
                    for c3, _k3, b3, l3 in _walk(buf, b2, b2 + l2):
                        if c3 == b"strh" and buf[b3:b3 + 4] == b"vids":
                            fourcc = buf[b3 + 4:b3 + 8]
                        elif c3 == b"strf" and l3 >= 16:
                            bitcount = struct.unpack_from("<H", buf,
                                                          b3 + 14)[0]
        elif kind == b"movi":
            walk_movi(bs, bs + bl)
    if w is None:
        raise ValueError("AVI missing avih header")
    uncompressed = fourcc in (b"DIB ", b"\x00\x00\x00\x00", b"RAW ") \
        and bitcount == 8
    pixels = ([dib8_decode(f, w, h) for f in frames]
              if uncompressed else None)
    return {"width": int(w), "height": int(h), "fps": int(fps),
            "n_frames": int(n_frames) or len(frames),
            "fourcc": fourcc.decode("latin1"),
            "frames": frames, "pixels": pixels}
