"""AVI demuxer/muxer (fatespark.avi): lossless DIB round trips, RIFF
structure handling, metadata, and the sample_frames wiring."""

import struct

import numpy as np
import pytest

from fatespark.avi import avi_decode, avi_encode, dib8_decode


class TestRoundTrip:
    def test_gray_frames_exact(self):
        rng = np.random.default_rng(2)
        frames = [rng.integers(0, 256, size=(9, 13)).astype(np.uint8)
                  for _ in range(6)]
        d = avi_decode(avi_encode(frames, fps=30))
        assert (d["width"], d["height"], d["fps"]) == (13, 9, 30)
        assert d["n_frames"] == 6 and d["fourcc"] == "DIB "
        assert all(np.array_equal(p, f)
                   for p, f in zip(d["pixels"], frames))

    def test_aligned_width(self):
        f = [np.arange(32, dtype=np.uint8).reshape(4, 8)]
        d = avi_decode(avi_encode(f))
        assert np.array_equal(d["pixels"][0], f[0])

    def test_row_padding(self):
        # w=13 -> 16-byte rows: padding bytes must be stripped exactly
        f = np.full((2, 13), 200, dtype=np.uint8)
        payload = avi_decode(avi_encode([f]))["frames"][0]
        assert len(payload) == 32
        assert np.array_equal(dib8_decode(payload, 13, 2), f)


class TestStructure:
    def test_rec_grouped_movi(self):
        # re-wrap the movi chunks in a 'rec ' LIST: must still demux
        frames = [np.full((4, 4), i * 40, dtype=np.uint8)
                  for i in range(3)]
        buf = bytearray(avi_encode(frames))
        i = bytes(buf).find(b"LIST", 12)
        while bytes(buf)[i + 8:i + 12] != b"movi":
            i = bytes(buf).find(b"LIST", i + 4)
        (mlen,) = struct.unpack_from("<I", buf, i + 4)
        body = bytes(buf)[i + 12:i + 8 + mlen]
        rec = b"LIST" + struct.pack("<I", 4 + len(body)) + b"rec " + body
        new_movi = b"LIST" + struct.pack("<I", 4 + len(rec)) + b"movi" + rec
        nbuf = bytes(buf)[:i] + new_movi
        nbuf = b"RIFF" + struct.pack("<I", len(nbuf) - 8 + (len(new_movi)
                                     - (8 + mlen))) + nbuf[8:]
        d = avi_decode(nbuf)
        assert len(d["frames"]) == 3
        assert np.array_equal(d["pixels"][1], frames[1])

    def test_compressed_codec_partial(self):
        # rewrite the stream fourcc: pixels become None, payloads remain
        buf = bytearray(avi_encode([np.zeros((4, 4), np.uint8)]))
        i = bytes(buf).find(b"vids") + 4
        buf[i:i + 4] = b"MJPG"
        d = avi_decode(bytes(buf))
        assert d["pixels"] is None and d["fourcc"] == "MJPG"
        assert len(d["frames"]) == 1

    def test_not_avi(self):
        with pytest.raises(ValueError):
            avi_decode(b"RIFF\x04\x00\x00\x00WAVE")
        with pytest.raises(ValueError):
            avi_decode(b"nope")


class TestSampleFramesWiring:
    def test_avi_frames_sampled_on_spark(self, spark):
        from fatespark import multimodal as mm
        rng = np.random.default_rng(11)
        frames = [rng.integers(0, 256, size=(6, 7)).astype(np.uint8)
                  for _ in range(5)]
        buf = avi_encode(frames)
        df = spark.createDataFrame([(1, bytearray(buf))],
                                   "doc_id long, payload binary")
        rows = mm.sample_frames(df, every_n=2).collect()
        assert [r["frame_idx"] for r in rows] == [0, 2, 4]
        for r in rows:
            w, h, flat = mm.decode_image(bytes(r["frame"]))
            assert (w, h) == (7, 6)
            assert np.array_equal(flat.reshape(6, 7),
                                  frames[r["frame_idx"]])

    def test_compressed_avi_raises_loudly(self, spark):
        from fatespark import multimodal as mm
        buf = bytearray(avi_encode([np.zeros((4, 4), np.uint8)]))
        i = bytes(buf).find(b"vids") + 4
        buf[i:i + 4] = b"H264"
        df = spark.createDataFrame([(1, buf)],
                                   "doc_id long, payload binary")
        with pytest.raises(Exception, match="H264"):
            mm.sample_frames(df, every_n=1).collect()
