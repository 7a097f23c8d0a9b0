"""Pure-numpy baseline JPEG codec tests (xops/jpeg.py).

The encoder embeds its Huffman tables via DHT, so decode exercises the
same table-parsing path a foreign JPEG would; the 4:2:0 test below
hand-crafts a subsampled file the encoder itself never emits."""

import struct

import numpy as np
import pytest

from dbt_icebreaker_spark.xops.jpeg import (
    _BitWriter,
    _canonical_single_length,
    decode_jpeg,
    encode_jpeg,
)


class TestRoundTrip:
    def test_constant_gray_exact(self):
        a = np.full((16, 24), 77, dtype=np.uint8)
        d = decode_jpeg(encode_jpeg(a))
        assert d.shape == (16, 24, 1)
        assert np.array_equal(d[:, :, 0], a)

    def test_per_block_constant_exact(self):
        a = np.zeros((24, 16), dtype=np.uint8)
        for by in range(3):
            for bx in range(2):
                a[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 30 + 9 * by + 5 * bx
        d = decode_jpeg(encode_jpeg(a))
        assert np.array_equal(d[:, :, 0], a)

    def test_gradient_near_lossless(self):
        a = (np.arange(32)[:, None] * 4 + np.arange(40)[None, :] * 2).astype(np.uint8)
        d = decode_jpeg(encode_jpeg(a))
        assert np.abs(d[:, :, 0].astype(int) - a.astype(int)).max() <= 1

    def test_random_noise_all_ones_quant(self):
        rng = np.random.default_rng(7)
        a = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
        d = decode_jpeg(encode_jpeg(a))
        # only DCT-coefficient rounding: tiny bounded error even on noise
        assert np.abs(d[:, :, 0].astype(int) - a.astype(int)).max() <= 2

    def test_rgb_ycbcr_roundtrip(self):
        a = np.zeros((16, 16, 3), dtype=np.uint8)
        a[:, :] = (200, 30, 90)
        d = decode_jpeg(encode_jpeg(a))
        assert d.shape == (16, 16, 3)
        assert np.abs(d.astype(int) - a.astype(int)).max() <= 2  # color rounding

    def test_non_multiple_of_8_dims(self):
        a = np.full((13, 19), 101, dtype=np.uint8)
        d = decode_jpeg(encode_jpeg(a))
        assert d.shape == (13, 19, 1)
        assert np.array_equal(d[:, :, 0], a)

    def test_quantized_lossy_still_close(self):
        q = np.full(64, 8, dtype=np.int64)
        a = (np.arange(16)[:, None] * 8 + np.arange(16)[None, :] * 4).astype(np.uint8)
        d = decode_jpeg(encode_jpeg(a, quant=q))
        assert np.abs(d[:, :, 0].astype(int) - a.astype(int)).max() <= 24


class TestRobustness:
    def test_non_jpeg_none(self):
        assert decode_jpeg(b"\x89PNG\r\n\x1a\n garbage") is None
        assert decode_jpeg(b"") is None
        assert decode_jpeg(b"\xff\xd8") is None

    def test_lossless_and_arithmetic_refused(self):
        raw = bytearray(encode_jpeg(np.full((8, 8), 9, dtype=np.uint8)))
        i = raw.find(b"\xff\xc0")
        for sof in (0xC3, 0xC9, 0xCB):  # lossless / arithmetic
            raw2 = bytearray(raw)
            raw2[i + 1] = sof
            assert decode_jpeg(bytes(raw2)) is None

    def test_truncated_quarantines(self):
        raw = encode_jpeg(np.full((16, 16), 50, dtype=np.uint8))
        assert decode_jpeg(raw[: len(raw) // 2]) is None  # not an exception


class TestSubsampled420:
    def test_constant_color_420(self):
        """Hand-crafted 4:2:0 file: Y sampled 2x2, Cb/Cr 1x1 — one MCU
        = 4 Y blocks + Cb + Cr covering 16×16 px. Constant color, so
        every block is DC-only and the decode must be exact."""
        yv, cbv, crv = 120, 140, 90  # YCbCr constants
        dc_vals = {}  # per component: quantized DC = 8*(v-128)
        for name, v in (("y", yv), ("cb", cbv), ("cr", crv)):
            dc_vals[name] = int(8 * (v - 128))

        # symbols: DC sizes of first-diff and zero-diff, EOB
        def size(v):
            return abs(v).bit_length()

        dc_syms = {size(dc_vals["y"]), size(dc_vals["cb"]), size(dc_vals["cr"]), 0}
        ac_syms = {0x00}
        dc_bits, dc_valtab, dc_codes = _canonical_single_length(dc_syms)
        ac_bits, ac_valtab, ac_codes = _canonical_single_length(ac_syms)

        bw = _BitWriter()

        def put_dc(diff):
            s = size(diff)
            code, ln = dc_codes[s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            code, ln = ac_codes[0x00]
            bw.write(code, ln)  # EOB

        # MCU order: Y,Y,Y,Y,Cb,Cr — DC is differential per component
        put_dc(dc_vals["y"])
        for _ in range(3):
            put_dc(0)
        put_dc(dc_vals["cb"])
        put_dc(dc_vals["cr"])
        data = bw.flush()

        def seg(marker, body):
            return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

        raw = bytearray(b"\xff\xd8")
        raw += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        sof = struct.pack(">BHHB", 8, 16, 16, 3)
        sof += bytes([1, 0x22, 0])  # Y: 2x2 sampling
        sof += bytes([2, 0x11, 0])  # Cb: 1x1
        sof += bytes([3, 0x11, 0])  # Cr: 1x1
        raw += seg(0xC0, sof)
        raw += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_valtab))
        raw += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_valtab))
        raw += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        raw += data + b"\xff\xd9"

        d = decode_jpeg(bytes(raw))
        assert d is not None and d.shape == (16, 16, 3)
        # expected RGB from the JFIF inverse transform
        r = round(yv + 1.402 * (crv - 128))
        g = round(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128))
        b = round(yv + 1.772 * (cbv - 128))
        assert (d[:, :, 0] == r).all()
        assert (d[:, :, 1] == g).all()
        assert (d[:, :, 2] == b).all()


class TestDispatcher:
    def test_decode_image_routes_both_formats(self):
        from dbt_icebreaker_spark.xops.imaging import decode_image, encode_png

        a = np.full((8, 8), 50, dtype=np.uint8)
        assert decode_image(encode_jpeg(a)).shape == (8, 8, 1)
        assert decode_image(encode_png(a)).shape == (8, 8, 1)
        assert decode_image(b"neither") is None


class TestProgressive:
    """SOF2 decode: spectral selection + successive approximation
    (T.81 Annex G), all four scan kinds exercised by the progressive
    encoder and pinned by bit-exact equivalence with baseline."""

    def _both(self, a):
        from dbt_icebreaker_spark.xops.jpeg import encode_jpeg_progressive

        db = decode_jpeg(encode_jpeg(a))
        dp = decode_jpeg(encode_jpeg_progressive(a))
        assert dp is not None
        return db, dp

    def test_constant_matches_baseline(self):
        db, dp = self._both(np.full((16, 24), 77, dtype=np.uint8))
        assert np.array_equal(db, dp)
        assert np.array_equal(dp[:, :, 0], np.full((16, 24), 77, dtype=np.uint8))

    def test_noise_matches_baseline_exactly(self):
        # random noise drives AC refinement hard: newly-nonzero
        # placement, ZRL runs, history correction bits, EOB tails
        rng = np.random.default_rng(11)
        a = rng.integers(0, 256, size=(40, 32), dtype=np.uint8)
        db, dp = self._both(a)
        assert np.array_equal(db, dp)

    def test_rgb_and_odd_dims(self):
        rgb = np.zeros((13, 19, 3), dtype=np.uint8)
        rgb[:, :] = (200, 30, 90)
        db, dp = self._both(rgb)
        assert np.array_equal(db, dp) and dp.shape == (13, 19, 3)

    def test_probe_reports_progressive(self):
        from dbt_icebreaker_spark.xops.jpeg import encode_jpeg_progressive
        from dbt_icebreaker_spark.xops.multimodal import probe_bytes

        raw = encode_jpeg_progressive(np.full((8, 16), 5, dtype=np.uint8))
        p = probe_bytes(raw)
        assert p["subformat"] == "progressive"
        assert (p["width"], p["height"]) == (16, 8)

    def test_truncated_progressive_best_effort(self):
        from dbt_icebreaker_spark.xops.jpeg import encode_jpeg_progressive

        a = np.full((16, 16), 90, dtype=np.uint8)
        raw = encode_jpeg_progressive(a)
        # cut after the DC scans: decode still yields the DC
        # approximation (progressive's defining property) or None —
        # never an exception
        for cut in (len(raw) // 2, len(raw) - 10):
            d = decode_jpeg(raw[:cut])
            assert d is None or d.shape == (16, 16, 1)
