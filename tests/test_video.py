"""MJPEG-in-MP4 mux/demux/frame-extract tests (xops/video.py)."""

import struct

import numpy as np
import pytest

from dbt_icebreaker_spark.xops.jpeg import decode_jpeg, encode_jpeg
from dbt_icebreaker_spark.xops.video import (
    demux_mp4_samples,
    mux_mjpeg_mp4,
)


def _frames(n, base=40):
    return [
        encode_jpeg(np.full((8, 8), base + 7 * i, dtype=np.uint8)) for i in range(n)
    ]


class TestMuxDemuxRoundTrip:
    def test_samples_and_timestamps(self):
        frames = _frames(5)
        raw = mux_mjpeg_mp4(frames, fps=10, width=8, height=8)
        info = demux_mp4_samples(raw)
        assert info["codec"] == "jpeg"
        assert len(info["samples"]) == 5
        ts = info["timescale"]
        for i, (off, size, t) in enumerate(info["samples"]):
            assert raw[off : off + size] == frames[i]
            assert t / ts == pytest.approx(i / 10)

    def test_sampled_frames_decode(self):
        frames = _frames(4, base=60)
        raw = mux_mjpeg_mp4(frames, fps=5)
        info = demux_mp4_samples(raw)
        for i, (off, size, _) in enumerate(info["samples"]):
            px = decode_jpeg(raw[off : off + size])
            assert float(px.mean()) == 60 + 7 * i  # exact decode

    def test_probe_agrees_with_muxer(self):
        from dbt_icebreaker_spark.xops.multimodal import probe_bytes

        raw = mux_mjpeg_mp4(_frames(10), fps=10, width=8, height=8)
        p = probe_bytes(raw)
        assert p["format"] == "mp4" and p["valid"]
        assert (p["width"], p["height"]) == (8, 8)
        assert p["duration_s"] == pytest.approx(1.0)


class TestDemuxRobustness:
    def test_non_bmff_none(self):
        assert demux_mp4_samples(b"not a video") is None
        assert demux_mp4_samples(encode_jpeg(np.zeros((8, 8), np.uint8))) is None

    def test_truncated_tables_none(self):
        raw = mux_mjpeg_mp4(_frames(3))
        # cut inside moov → stbl incomplete
        assert demux_mp4_samples(raw[: len(raw) - 40]) is None

    def test_foreign_codec_still_demuxes(self):
        # relabel the sample entry fourcc to avc1: offsets/sizes must
        # still come out (decode is the only MJPEG-specific part)
        raw = bytearray(mux_mjpeg_mp4(_frames(3)))
        i = raw.find(b"jpeg", raw.find(b"stsd"))
        raw[i : i + 4] = b"avc1"
        info = demux_mp4_samples(bytes(raw))
        assert info["codec"] == "avc1" and len(info["samples"]) == 3

    def test_multi_chunk_stsc_expansion(self):
        """Rewrite stsc/stco into two chunks (2+1 samples) and check
        the sample→chunk walk still lands on the right bytes."""
        frames = _frames(3)
        raw = mux_mjpeg_mp4(frames, fps=10)
        info1 = demux_mp4_samples(raw)
        offs = [o for o, _, _ in info1["samples"]]
        out = bytearray(raw)

        def patch(tag, body):
            i = out.find(tag)
            (size,) = struct.unpack(">I", bytes(out[i - 4 : i]))
            new = struct.pack(">I", len(body) + 12) + tag + b"\x00" * 4 + body
            out[i - 4 : i - 4 + size] = new

        # two stsc runs: chunk 1 holds 2 samples, chunk 2 holds 1
        patch(b"stsc", struct.pack(">I", 2)
              + struct.pack(">III", 1, 2, 1) + struct.pack(">III", 2, 1, 1))
        patch(b"stco", struct.pack(">I", 2)
              + struct.pack(">II", offs[0], offs[2]))
        info2 = demux_mp4_samples(bytes(out))
        assert len(info2["samples"]) == 3
        for i, (off, size, _) in enumerate(info2["samples"]):
            assert bytes(out[off : off + size]) == frames[i]


class TestExtractFramesSpark:
    def test_uniform_selection_and_decode(self, spark):
        from pyspark.sql import functions as F

        from dbt_icebreaker_spark.xops import imaging, video

        base = spark.range(6).select(F.col("id").alias("doc_id"))
        media = video.synthesize_mjpeg_corpus(base, "doc_id")
        frames = video.extract_frames_mp4(media, max_frames=3)
        got = frames.collect()
        # per doc: min(3, nf) frames, nf = (doc_id % 4) + 2
        by_doc = {}
        for r in got:
            by_doc.setdefault(r.media_id, []).append(r)
        for k in range(6):
            nf = (k % 4) + 2
            assert len(by_doc[k]) == min(3, nf)
        # every payload decodes to its arithmetic mean
        for r in got:
            px = imaging.decode_image(bytes(r.frame_payload))
            nf = (r.media_id % 4) + 2
            take = min(3, nf)
            sel = sorted({(j * nf) // take for j in range(take)})
            si = sel[r.frame_idx]
            assert float(px.mean()) == (r.media_id % 80) + 7 * si
            assert r.ts_s == pytest.approx(si * 0.1)
