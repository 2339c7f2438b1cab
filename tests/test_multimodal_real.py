"""Real multimodal codecs: RIFF/WAV PCM (8/16/24-bit), PNG (all five
scanline filters, every legal depth, Adam7), JPEG/GIF header metadata —
pure stdlib + numpy, no codec libraries (pixel codecs live in
test_jpeg.py / test_gif.py).

Independence of the checks: WAV fixtures are written by the stdlib ``wave``
module (a third-party-to-us RIFF writer) and read by our parser, and vice
versa; PNG defiltering is additionally checked against a hand-computed
2x2 vector per filter type, not just round-trip.
"""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from fatespark import multimodal as mm


def fake_jpeg(w: int, h: int, nc: int = 3) -> bytes:
    """Minimal structurally-valid JPEG header stream (SOI+APP0+DQT+SOF0+EOI)
    — enough for any SOF-walking metadata reader; no entropy data."""
    app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x01\x02\x00" + b"\x00\x01\x00\x01\x00\x00")
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof = (b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc)
           + struct.pack(">BHHB", 8, h, w, nc) + bytes(3 * nc))
    return b"\xff\xd8" + app0 + dqt + sof + b"\xff\xd9"


class TestWav:
    def test_stdlib_writer_our_reader(self):
        rng = np.random.default_rng(7)
        s = rng.integers(-32768, 32767, 500).astype(np.int16)
        bio = io.BytesIO()
        with wave.open(bio, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(s.tobytes())
        rate, ch, bits, out = mm.wav_decode(bio.getvalue())
        assert (rate, ch, bits) == (44100, 2, 16)
        assert np.array_equal(out, s)

    def test_our_writer_stdlib_reader(self):
        s = (np.arange(64, dtype=np.int64) * 31 % 2048 - 1024).astype(np.int16)
        buf = mm.wav_encode_pcm16(s, 16000, 1)
        with wave.open(io.BytesIO(buf), "rb") as r:
            assert r.getframerate() == 16000
            assert r.getnchannels() == 1
            assert r.getsampwidth() == 2
            assert r.readframes(64) == s.tobytes()

    def test_8bit_pcm(self):
        u = np.array([0, 128, 255, 64], dtype=np.uint8)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", 4) + u.tobytes())
        buf = b"RIFF" + struct.pack("<I", len(body)) + body
        rate, ch, bits, s = mm.wav_decode(buf)
        assert (rate, ch, bits) == (8000, 1, 8)
        assert s.tolist() == [(-128) << 8, 0, 127 << 8, (-64) << 8]

    def test_skips_odd_padded_chunks(self):
        # a 3-byte LIST chunk (odd -> 1 pad byte) before fmt/data
        s = np.array([5, -5], dtype=np.int16)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = (b"WAVE" + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", 4) + s.tobytes())
        buf = b"RIFF" + struct.pack("<I", len(body)) + body
        rate, ch, bits, out = mm.wav_decode(buf)
        assert rate == 8000 and np.array_equal(out, s)

    def test_non_pcm_raises(self):
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float
        body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", 0))
        with pytest.raises(NotImplementedError):
            mm.wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)

    def test_decode_audio_routes_riff(self):
        s = np.array([100, -100, 3], dtype=np.int16)
        rate, out = mm.decode_audio(mm.wav_encode_pcm16(s, 22050))
        assert rate == 22050 and np.array_equal(out, s)


class TestPng:
    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("shape,ctype", [((11, 7), 0), ((9, 5, 3), 2),
                                             ((4, 6, 4), 6), ((1, 13, 2), 4)])
    def test_roundtrip_all_filters(self, ft, shape, ctype):
        rng = np.random.default_rng(ft * 100 + len(shape))
        px = rng.integers(0, 256, shape).astype(np.uint8)
        w, h, bd, ct, out = mm.png_decode(mm.png_encode(px, ft))
        assert (w, h, bd, ct) == (shape[1], shape[0], 8, ctype)
        assert np.array_equal(out, px)

    def test_hand_computed_defilter(self):
        """2x2 gray, known filtered bytes per the PNG spec, checked against
        a hand computation (not a round-trip)."""
        # pixels: [[10, 20], [30, 255]]
        # row0 Sub(1):  f = [10, 20-10] = [10, 10]
        # row1 Paeth(4): preds = [paeth(0,10,0)=10, paeth(30,20,10)=30]
        #   (p=30+20-10=40 -> pa=10, pb=20, pc=30 -> left)
        #   f = [30-10, (255-30)%256] = [20, 225]
        scan = bytes([1, 10, 10, 4, 20, 225])
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
        sig = b"\x89PNG\r\n\x1a\n"
        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))
        buf = (sig + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
        _, _, _, _, px = mm.png_decode(buf)
        assert px.tolist() == [[10, 20], [30, 255]]

    def test_multiple_idat_chunks(self):
        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        buf = mm.png_encode(px, 2)
        # split the single IDAT into two
        sig_len = 8
        ihdr = buf[sig_len:sig_len + 25]
        idat_len = struct.unpack_from(">I", buf, sig_len + 25)[0]
        idat_data = buf[sig_len + 25 + 8: sig_len + 25 + 8 + idat_len]
        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))
        rebuilt = (buf[:sig_len] + ihdr
                   + chunk(b"IDAT", idat_data[:5])
                   + chunk(b"IDAT", idat_data[5:]) + chunk(b"IEND", b""))
        _, _, _, _, out = mm.png_decode(rebuilt)
        assert np.array_equal(out, px)

    def test_palette(self):
        # 2x2 palette image: indices [[0,1],[1,2]]
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
        scan = bytes([0, 0, 1, 0, 1, 2])
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))
        buf = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"PLTE", plte)
               + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
        w, h, _, ct, px = mm.png_decode(buf)
        assert (w, h, ct) == (2, 2, 3)
        assert px.tolist() == [[[255, 0, 0], [0, 255, 0]],
                               [[0, 255, 0], [0, 0, 255]]]

    def test_illegal_depth_raises(self):
        px = np.zeros((2, 2), np.uint8)
        buf = bytearray(mm.png_encode(px))
        buf[24] = 3  # bit depth byte in IHDR: 3 is not a legal PNG depth
        with pytest.raises(ValueError):
            mm.png_decode(bytes(buf))

    @pytest.mark.parametrize("depth", [1, 2, 4])
    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_packed_gray_roundtrip(self, depth, ft):
        rng = np.random.default_rng(depth * 10 + ft)
        # odd width exercises the trailing pad bits
        px = rng.integers(0, 1 << depth, size=(6, 11)).astype(np.uint8)
        w, h, bd, ct, out = mm.png_decode(
            mm.png_encode(px, ft, bit_depth=depth))
        assert (w, h, bd, ct) == (11, 6, depth, 0)
        assert np.array_equal(out, px)   # RAW small samples

    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_packed_gray_adam7(self, depth):
        rng = np.random.default_rng(depth)
        px = rng.integers(0, 1 << depth, size=(13, 9)).astype(np.uint8)
        _, _, bd, _, out = mm.png_decode(
            mm.png_encode(px, 4, bit_depth=depth, interlace=True))
        assert bd == depth and np.array_equal(out, px)

    def test_packed_palette_decode(self):
        # hand-craft a 2-bit palette PNG: 2x3 indices [[0,1,2],[3,0,1]]
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
        # rows packed MSB-first, 2 bits/sample: 00 01 10 pad / 11 00 01 pad
        scan = bytes([0, 0b00011000, 0, 0b11000100])
        ihdr = struct.pack(">IIBBBBB", 3, 2, 2, 3, 0, 0, 0)
        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))
        buf = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"PLTE", plte)
               + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
        w, h, bd, ct, px = mm.png_decode(buf)
        assert (w, h, bd, ct) == (3, 2, 2, 3)
        assert px.tolist() == [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                               [[9, 9, 9], [255, 0, 0], [0, 255, 0]]]

    def test_decode_image_packed_gray_scales(self):
        px = np.array([[0, 1], [2, 3]], dtype=np.uint8)
        _, _, flat = mm.decode_image(mm.png_encode(px, bit_depth=2))
        assert flat.tolist() == [0, 85, 170, 255]

    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_16bit_roundtrip(self, ft):
        rng = np.random.default_rng(ft + 50)
        px = rng.integers(0, 65536, size=(7, 9)).astype(np.uint16)
        w, h, bd, ct, out = mm.png_decode(mm.png_encode(px, ft))
        assert (w, h, bd, ct) == (9, 7, 16, 0)
        assert out.dtype == np.uint16 and np.array_equal(out, px)

    @pytest.mark.parametrize("shape", [(13, 9), (8, 8), (1, 1),
                                       (3, 17, 3), (5, 2, 4)])
    def test_adam7_roundtrip(self, shape):
        rng = np.random.default_rng(sum(shape))
        px = rng.integers(0, 256, size=shape).astype(np.uint8)
        w, h, bd, ct, out = mm.png_decode(
            mm.png_encode(px, 4, interlace=True))
        assert np.array_equal(out, px)

    def test_adam7_16bit_roundtrip(self):
        rng = np.random.default_rng(99)
        px = rng.integers(0, 65536, size=(11, 6, 3)).astype(np.uint16)
        _, _, bd, _, out = mm.png_decode(
            mm.png_encode(px, 2, interlace=True))
        assert bd == 16 and np.array_equal(out, px)

    def test_decode_image_16bit_demotes(self):
        px = np.array([[0, 65535], [256, 32768]], dtype=np.uint16)
        _, _, flat = mm.decode_image(mm.png_encode(px))
        assert flat.tolist() == [0, 255, 1, 128]

    def test_decode_image_routes_png_luma(self):
        g = np.array([[0, 255], [128, 1]], np.uint8)
        w, h, px = mm.decode_image(mm.png_encode(g, 1))
        assert (w, h) == (2, 2) and np.array_equal(px, g.reshape(-1))
        rgb = np.zeros((1, 1, 3), np.uint8)
        rgb[0, 0] = (255, 255, 255)
        _, _, px = mm.decode_image(mm.png_encode(rgb))
        assert px[0] == (77 * 255 + 150 * 255 + 29 * 255) >> 8


class TestJpegGif:
    def test_jpeg_sof_walk(self):
        assert mm.jpeg_dimensions(fake_jpeg(640, 480)) == (640, 480, 3)
        assert mm.jpeg_dimensions(fake_jpeg(31, 17, 1)) == (31, 17, 1)

    def test_jpeg_progressive_sof2(self):
        buf = bytearray(fake_jpeg(100, 50))
        i = buf.find(b"\xff\xc0")
        buf[i + 1] = 0xC2  # SOF2 progressive
        assert mm.jpeg_dimensions(bytes(buf)) == (100, 50, 3)

    def test_jpeg_no_sof_raises(self):
        with pytest.raises(ValueError):
            mm.jpeg_dimensions(b"\xff\xd8\xff\xd9")

    def test_gif(self):
        buf = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
        assert mm.gif_dimensions(buf) == (320, 200)
        with pytest.raises(ValueError):
            mm.gif_dimensions(b"GIF00a" + bytes(8))

    def test_jpeg_pixel_decode_real(self):
        # baseline JPEG pixels decode for real now (fatespark.jpeg); a
        # header-only stream with no scan is a loud ValueError, and the
        # remaining gates (progressive/arithmetic) live in jpeg_decode
        with pytest.raises(ValueError, match="no SOS"):
            mm.decode_image(fake_jpeg(2, 2))
        import numpy as np
        from fatespark.jpeg import jpeg_encode
        px = np.full((8, 16), 99, dtype=np.uint8)
        w, h, flat = mm.decode_image(jpeg_encode(px, quality=None))
        assert (w, h) == (16, 8)
        assert np.array_equal(flat.reshape(8, 16), px)


class TestSparkPipelines:
    def test_wav_png_jpeg_metadata(self, spark):
        import pandas as pd

        # defined inside the test so cloudpickle ships it by value (the
        # test module itself is not importable on executor pythons)
        def _jpeg(w, h, nc):
            app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
                    + b"\x01\x02\x00" + b"\x00\x01\x00\x01\x00\x00")
            sof = (b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc)
                   + struct.pack(">BHHB", 8, h, w, nc) + bytes(3 * nc))
            return b"\xff\xd8" + app0 + sof + b"\xff\xd9"

        def gen(batches):
            for pdf in batches:
                ids = pdf["doc_id"].tolist()
                wavs, pngs, jpgs = [], [], []
                for d in ids:
                    s = ((np.arange(64, dtype=np.int64) * (d % 97 + 3))
                         % 2048 - 1024).astype(np.int16)
                    wavs.append(mm.wav_encode_pcm16(s, 16000, 1))
                    px = ((np.arange(64, dtype=np.uint64)
                           * np.uint64(2 * d + 1)) % np.uint64(251)
                          ).astype(np.uint8).reshape(8, 8)
                    pngs.append(mm.png_encode(px, d % 5))
                    jpgs.append(_jpeg(d % 100 + 16, d % 77 + 16,
                                      d % 3 + 1))
                yield pd.DataFrame({"doc_id": ids, "wav": wavs,
                                    "png": pngs, "jpg": jpgs})

        base = spark.range(0, 40, 1, 4).withColumnRenamed("id", "doc_id")
        df = base.mapInPandas(
            gen, "doc_id long, wav binary, png binary, jpg binary")
        df = df.cache()

        wm = {r["doc_id"]: r for r in
              mm.wav_metadata(df, "wav").collect()}
        pm = {r["doc_id"]: r for r in
              mm.png_metadata(df, "png").collect()}
        jm = {r["doc_id"]: r for r in
              mm.jpeg_metadata(df, "jpg").collect()}
        assert len(wm) == len(pm) == len(jm) == 40
        for d in range(40):
            s = ((np.arange(64, dtype=np.int64) * (d % 97 + 3))
                 % 2048 - 1024).astype(np.float64)
            assert wm[d]["sample_rate"] == 16000
            assert wm[d]["bits"] == 16 and wm[d]["channels"] == 1
            assert wm[d]["rms"] == pytest.approx(
                float(np.sqrt(np.mean(s ** 2))), abs=0, rel=0)
            px = ((np.arange(64, dtype=np.uint64) * np.uint64(2 * d + 1))
                  % np.uint64(251)).astype(np.float64)
            assert (pm[d]["width"], pm[d]["height"]) == (8, 8)
            assert pm[d]["color_type"] == 0
            assert pm[d]["mean_px"] == px.mean()
            assert jm[d]["width"] == d % 100 + 16
            assert jm[d]["height"] == d % 77 + 16
            assert jm[d]["n_components"] == d % 3 + 1
        df.unpersist()


class TestWav24:
    def test_24bit_pcm_demoted_to_top16(self):
        import numpy as np
        # hand-build a 24-bit mono WAV: values chosen so >>8 is exact
        vals = np.array([0, 1 << 8, -(1 << 8), (1 << 23) - 256,
                         -(1 << 23)], dtype=np.int64)
        raw = bytearray()
        for v in vals:
            raw += int(v & 0xFFFFFF).to_bytes(3, "little")
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(raw)) + bytes(raw))
        buf = b"RIFF" + struct.pack("<I", len(body)) + body
        rate, ch, bits, s = mm.wav_decode(buf)
        assert (rate, ch, bits) == (8000, 1, 24)
        assert s.tolist() == (vals >> 8).tolist()
