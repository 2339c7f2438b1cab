"""Baseline-sequential JPEG codec (fatespark.jpeg): exactness contract for
tile-constant content with unit quant tables, bounded-error round trips for
arbitrary content, subsampling/restart/16-bit-DQT paths, the non-baseline
gates, and the multimodal.decode_image luma wiring."""

import struct

import numpy as np
import pytest

from fatespark.jpeg import (QUANT_LUMA, jpeg_decode, jpeg_encode,
                            rgb_to_ycbcr)
from fatespark.multimodal import decode_image, jpeg_dimensions


def _tiles(rng, th, tw):
    vals = rng.integers(16, 240, size=(th, tw))
    return np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)


class TestExactness:
    def test_tile_constant_gray_unit_tables_exact(self):
        rng = np.random.default_rng(11)
        px = _tiles(rng, 3, 4)                      # 24 x 32
        buf = jpeg_encode(px, quality=None)
        w, h, planes, samp = jpeg_decode(buf)
        assert (w, h) == (32, 24) and samp == [(1, 1)]
        assert np.array_equal(planes[0], px)

    def test_partial_edge_blocks_exact(self):
        # non-multiple-of-8 dims: encoder pads by edge replication, decoder
        # crops; tile-constant content stays exact through both
        rng = np.random.default_rng(12)
        px = _tiles(rng, 3, 4)[:20, :27]
        buf = jpeg_encode(px, quality=None)
        w, h, planes, _ = jpeg_decode(buf)
        assert (w, h) == (27, 20)
        assert np.array_equal(planes[0], px)

    def test_restart_interval_exact(self):
        rng = np.random.default_rng(13)
        px = _tiles(rng, 2, 5)
        buf = jpeg_encode(px, quality=None, restart_interval=2)
        assert b"\xff\xd0" in buf or b"\xff\xd1" in buf
        _, _, planes, _ = jpeg_decode(buf)
        assert np.array_equal(planes[0], px)

    def test_single_block_dc_only(self):
        px = np.full((8, 8), 200, dtype=np.uint8)
        _, _, planes, _ = jpeg_decode(jpeg_encode(px, quality=None))
        assert np.array_equal(planes[0], px)


class TestRoundTrip:
    def test_random_gray_unit_tables_near_exact(self):
        rng = np.random.default_rng(21)
        px = rng.integers(0, 256, size=(17, 23)).astype(np.uint8)
        _, _, planes, _ = jpeg_decode(jpeg_encode(px, quality=None))
        err = np.abs(planes[0].astype(int) - px.astype(int)).max()
        assert err <= 1       # FDCT/IDCT double rounding only

    @pytest.mark.parametrize("quality", [50, 75, 95])
    def test_quality_bounded_error(self, quality):
        rng = np.random.default_rng(quality)
        # smooth gradient content: quantization error stays small
        y, x = np.mgrid[0:24, 0:24]
        px = ((y * 3 + x * 2) % 200 + 20).astype(np.uint8)
        _, _, planes, _ = jpeg_decode(jpeg_encode(px, quality=quality))
        err = np.abs(planes[0].astype(int) - px.astype(int)).mean()
        assert err < 16

    @pytest.mark.parametrize("sub", ["444", "422", "420"])
    def test_color_luma_round_trip(self, sub):
        rng = np.random.default_rng(31)
        c = rng.integers(0, 256, size=(19, 21, 3)).astype(np.uint8)
        buf = jpeg_encode(c, quality=None, subsampling=sub)
        w, h, planes, samp = jpeg_decode(buf)
        assert (w, h) == (21, 19) and len(planes) == 3
        want = rgb_to_ycbcr(c)[..., 0].astype(int)
        assert np.abs(planes[0].astype(int) - want).max() <= 1
        hs, vs = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[sub]
        assert samp[0] == (hs, vs)
        # chroma planes come back at native (subsampled) resolution
        assert planes[1].shape == ((19 + vs - 1) // vs,
                                   (21 + hs - 1) // hs)

    def test_interop_with_header_walk(self):
        # the header-only fast path reads the same SOF our encoder writes
        px = np.zeros((24, 40), dtype=np.uint8)
        buf = jpeg_encode(px, quality=80)
        assert jpeg_dimensions(buf) == (40, 24, 1)


class TestDecoderFormats:
    def test_16bit_quant_table(self):
        # re-emit a stream with a 16-bit DQT (Pq=1): decoder must accept
        px = np.full((8, 8), 77, dtype=np.uint8)
        buf = bytearray(jpeg_encode(px, quality=None))
        i = buf.find(b"\xff\xdb")
        seglen = struct.unpack_from(">H", buf, i + 2)[0]
        assert seglen == 67
        zz8 = bytes(buf[i + 5:i + 5 + 64])
        wide = b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) \
            + bytes([0x10]) + b"".join(struct.pack(">H", b) for b in zz8)
        nbuf = bytes(buf[:i]) + wide + bytes(buf[i + 4 + seglen - 2:])
        _, _, planes, _ = jpeg_decode(nbuf)
        assert np.array_equal(planes[0], px)

    def test_progressive_gate(self):
        sof2 = b"\xff\xd8\xff\xc2" + struct.pack(">H", 11) \
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes(3) + b"\xff\xd9"
        with pytest.raises(NotImplementedError, match="progressive"):
            jpeg_decode(sof2)

    def test_arithmetic_gate(self):
        sof9 = b"\xff\xd8\xff\xc9" + struct.pack(">H", 11) \
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes(3) + b"\xff\xd9"
        with pytest.raises(NotImplementedError, match="arithmetic"):
            jpeg_decode(sof9)

    def test_12bit_gate(self):
        sof = b"\xff\xd8\xff\xc0" + struct.pack(">H", 11) \
            + struct.pack(">BHHB", 12, 8, 8, 1) + bytes(3) + b"\xff\xd9"
        with pytest.raises(NotImplementedError, match="12-bit"):
            jpeg_decode(sof)

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError):
            jpeg_decode(b"PNG whatever")


class TestMultimodalWiring:
    def test_decode_image_jpeg_luma(self):
        rng = np.random.default_rng(41)
        px = _tiles(rng, 2, 3)
        w, h, flat = decode_image(jpeg_encode(px, quality=None))
        assert (w, h) == (24, 16)
        assert np.array_equal(flat.reshape(16, 24), px)

    def test_decode_image_color_jpeg_gives_luma(self):
        rng = np.random.default_rng(42)
        c = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
        w, h, flat = decode_image(jpeg_encode(c, quality=None))
        want = rgb_to_ycbcr(c)[..., 0].astype(int)
        assert (w, h) == (16, 16)
        assert np.abs(flat.reshape(16, 16).astype(int) - want).max() <= 1

    def test_gif_decodes_for_real_now(self):
        from fatespark.gif import gif_encode
        px = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
        w, h, flat = decode_image(gif_encode(px))
        assert (w, h) == (8, 8)
        assert np.array_equal(flat.reshape(8, 8), px)  # gray palette: luma==ix


class TestAnnexKTables:
    def test_quality_scaling_50_is_identity(self):
        from fatespark.jpeg import _quant_tables
        lt, _ = _quant_tables(50)
        assert np.array_equal(lt, QUANT_LUMA)

    def test_unit_tables(self):
        from fatespark.jpeg import _quant_tables
        lt, ct = _quant_tables(None)
        assert lt.max() == 1 and ct.max() == 1
