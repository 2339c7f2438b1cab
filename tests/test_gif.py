"""GIF codec (fatespark.gif): lossless round trips (LZW both ways),
interlace, palettes, dictionary growth/clear, multi-frame + GCE metadata,
and the multimodal.decode_image wiring."""

import struct

import numpy as np
import pytest

from fatespark.gif import gif_decode, gif_encode
from fatespark.multimodal import decode_image, gif_dimensions


class TestRoundTrip:
    def test_random_gray_exact(self):
        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, size=(23, 31)).astype(np.uint8)
        w, h, frames = gif_decode(gif_encode(px))
        assert (w, h) == (31, 23) and len(frames) == 1
        assert np.array_equal(frames[0]["ix"], px)
        # identity gray palette: every rgb channel equals the index
        assert np.array_equal(frames[0]["rgb"][..., 0], px)
        assert np.array_equal(frames[0]["rgb"][..., 2], px)

    def test_interlaced_exact(self):
        rng = np.random.default_rng(6)
        px = rng.integers(0, 256, size=(37, 19)).astype(np.uint8)
        buf = gif_encode(px, interlace=True)
        _, _, frames = gif_decode(buf)
        assert np.array_equal(frames[0]["ix"], px)

    def test_small_palette(self):
        rng = np.random.default_rng(7)
        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                        [10, 20, 30]], dtype=np.uint8)
        ix = rng.integers(0, 4, size=(9, 13)).astype(np.uint8)
        _, _, frames = gif_decode(gif_encode(ix, palette=pal))
        assert np.array_equal(frames[0]["ix"], ix)
        assert np.array_equal(frames[0]["rgb"], pal[ix])

    def test_two_color_min_code_size(self):
        # depth-1 palette exercises the min_code_size=2 floor
        pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
        ix = (np.add.outer(np.arange(8), np.arange(8)) % 2).astype(np.uint8)
        _, _, frames = gif_decode(gif_encode(ix, palette=pal))
        assert np.array_equal(frames[0]["ix"], ix)

    def test_dictionary_growth_and_clear(self):
        # big repetitive image: the LZW table hits 4096 and rebuilds
        big = (np.add.outer(np.arange(200), np.arange(300)) % 251
               ).astype(np.uint8)
        buf = gif_encode(big)
        assert len(buf) < big.size          # actually compresses
        _, _, frames = gif_decode(buf)
        assert np.array_equal(frames[0]["ix"], big)

    def test_constant_image_kwkwk_path(self):
        # constant runs drive the code==next_code (KwKwK) decode branch
        px = np.full((16, 16), 7, dtype=np.uint8)
        _, _, frames = gif_decode(gif_encode(px))
        assert np.array_equal(frames[0]["ix"], px)


class TestStreamFeatures:
    def test_multi_frame_with_gce(self):
        # hand-assemble a 2-frame animation with per-frame GCE metadata
        pal_bits = 7  # 256-entry table -> depth 8
        px1 = np.arange(64, dtype=np.uint8).reshape(8, 8)
        px2 = px1[::-1].copy()
        base1 = gif_encode(px1)
        base2 = gif_encode(px2)
        # splice: header+gct from base1, then GCE+frame1, GCE+frame2
        hdr_end = 13 + 256 * 3
        img1 = base1[hdr_end:-1]   # image descriptor..data (strip trailer)
        img2 = base2[hdr_end:-1]
        gce = (b"\x21\xf9\x04" + bytes([0x01, 50, 0, 3]) + b"\x00")
        buf = base1[:hdr_end] + gce + img1 + img2 + b"\x3b"
        w, h, frames = gif_decode(buf)
        assert len(frames) == 2
        assert np.array_equal(frames[0]["ix"], px1)
        assert np.array_equal(frames[1]["ix"], px2)
        assert frames[0]["transparent"] == 3
        assert frames[0]["delay_cs"] == 50
        assert frames[1]["transparent"] is None   # GCE scope is one frame

    def test_unknown_extension_skipped(self):
        px = np.full((4, 4), 9, dtype=np.uint8)
        base = gif_encode(px)
        hdr_end = 13 + 256 * 3
        comment = b"\x21\xfe" + bytes([5]) + b"hello" + b"\x00"
        buf = base[:hdr_end] + comment + base[hdr_end:]
        _, _, frames = gif_decode(buf)
        assert np.array_equal(frames[0]["ix"], px)

    def test_interop_with_header_walk(self):
        px = np.zeros((12, 34), dtype=np.uint8)
        assert gif_dimensions(gif_encode(px)) == (34, 12)

    def test_not_a_gif(self):
        with pytest.raises(ValueError):
            gif_decode(b"JPEG nope")

    def test_truncated_loud(self):
        px = np.full((8, 8), 5, dtype=np.uint8)
        buf = gif_encode(px)
        with pytest.raises(ValueError):
            gif_decode(buf[:20])


class TestMultimodalWiring:
    def test_decode_image_gray_luma(self):
        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, size=(11, 17)).astype(np.uint8)
        w, h, flat = decode_image(gif_encode(px))
        assert (w, h) == (17, 11)
        # identity gray palette -> luma of (v,v,v) is (77+150+29)v>>8 == v
        assert np.array_equal(flat.reshape(11, 17), px)

    def test_decode_image_color_palette_luma(self):
        pal = np.array([[200, 100, 40], [0, 0, 0]], dtype=np.uint8)
        ix = np.zeros((4, 4), dtype=np.uint8)
        ix[0, 0] = 1
        _, _, flat = decode_image(gif_encode(ix, palette=pal))
        want = (77 * 200 + 150 * 100 + 29 * 40) >> 8
        got = flat.reshape(4, 4)
        assert got[0, 0] == 0 and got[1, 1] == want


class TestVideoSampling:
    def test_gif_frames_sampled_on_spark(self, spark):
        import pandas as pd
        from fatespark import multimodal as mm
        from fatespark.gif import gif_encode, gif_decode
        # build a 5-frame animated GIF by splicing single-frame encodes
        pxs = [np.full((6, 7), 10 * i + 5, dtype=np.uint8)
               for i in range(5)]
        parts = [gif_encode(p) for p in pxs]
        hdr_end = 13 + 256 * 3
        buf = parts[0][:hdr_end] + b"".join(p[hdr_end:-1] for p in parts) \
            + b"\x3b"
        assert len(gif_decode(buf)[2]) == 5
        df = spark.createDataFrame([(1, bytearray(buf))],
                                   "doc_id long, payload binary")
        rows = mm.sample_frames(df, every_n=2).collect()
        assert [r["frame_idx"] for r in rows] == [0, 2, 4]
        # every emitted frame is a standalone decodable image
        for r in rows:
            w, h, flat = mm.decode_image(bytes(r["frame"]))
            assert (w, h) == (7, 6)
            assert np.array_equal(flat.reshape(6, 7),
                                  pxs[r["frame_idx"]])
