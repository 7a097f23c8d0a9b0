"""Byte-level tests for the MPEG audio frame-header probe (xops.audio)
— VERDICT r03 task 5: version/layer/bitrate/sample-rate/channels and a
frame-walk duration for compressed audio corpora without DSP decode.

Frame header layout: ISO 11172-3 §2.4.1.3 (MPEG-1) / ISO 13818-3.
"""

from __future__ import annotations

import pytest

from dbt_icebreaker_spark.xops import audio
from dbt_icebreaker_spark.xops.multimodal import probe_bytes


class TestFrameHeader:
    def test_mpeg1_layer3_128k(self):
        # 0xFF 0xFB = MPEG-1 Layer III no-CRC; 0x90 = 128 kbps @ 44100
        h = audio.parse_mp3_frame_header(bytes([0xFF, 0xFB, 0x90, 0x00]))
        assert h is not None
        assert (h["version"], h["layer"]) == ("1", 3)
        assert h["bitrate"] == 128000 and h["sample_rate"] == 44100
        assert h["channels"] == 2
        # canonical 128k@44.1 frame: 144*128000/44100 = 417 bytes
        assert h["frame_bytes"] == 417

    def test_padding_adds_one_byte(self):
        h = audio.parse_mp3_frame_header(bytes([0xFF, 0xFB, 0x92, 0x00]))
        assert h["padding"] == 1 and h["frame_bytes"] == 418

    def test_mono_flag(self):
        h = audio.parse_mp3_frame_header(bytes([0xFF, 0xFB, 0x90, 0xC0]))
        assert h["channels"] == 1

    def test_mpeg2_layer3_spf_576(self):
        # version bits 10 (MPEG-2) → 576 samples/frame for Layer III
        h = audio.parse_mp3_frame_header(bytes([0xFF, 0xF3, 0x90, 0x00]))
        assert h["version"] == "2" and h["samples_per_frame"] == 576

    def test_layer1_frame_size(self):
        # Layer I (bits 11): slots of 4 bytes, 384 samples/frame
        h = audio.parse_mp3_frame_header(bytes([0xFF, 0xFF, 0x90, 0x00]))
        assert h["layer"] == 1 and h["samples_per_frame"] == 384
        assert h["frame_bytes"] % 4 == 0

    @pytest.mark.parametrize(
        "hdr",
        [
            b"\x00\x00\x00\x00",              # no sync
            bytes([0xFF, 0xEB, 0x90, 0x00]),  # reserved version (01)
            bytes([0xFF, 0xF9, 0x90, 0x00]),  # reserved layer (00)
            bytes([0xFF, 0xFB, 0xF0, 0x00]),  # bad bitrate index 15
            bytes([0xFF, 0xFB, 0x9C, 0x00]),  # reserved sample rate 3
            bytes([0xFF, 0xFB, 0x00, 0x00]),  # free-format bitrate
        ],
    )
    def test_invalid_headers(self, hdr):
        assert audio.parse_mp3_frame_header(hdr) is None


class TestProbeWalk:
    def test_cbr_duration_exact(self):
        raw = audio.build_mp3_frames(38, bitrate_kbps=128, sample_rate=44100)
        p = audio.probe_mp3(raw)
        assert p is not None
        assert p["n_frames"] == 38 and not p["vbr"]
        # 38 frames * 1152 samples / 44100 Hz
        assert p["duration_s"] == pytest.approx(38 * 1152 / 44100)

    def test_vbr_duration_frame_accurate(self):
        sched = [128, 320, 32, 192] * 5
        raw = audio.build_mp3_frames(20, sample_rate=44100, bitrate_schedule=sched)
        p = audio.probe_mp3(raw)
        assert p["vbr"] is True and p["n_frames"] == 20
        # duration counts frames, not first-frame bitrate extrapolation
        assert p["duration_s"] == pytest.approx(20 * 1152 / 44100)
        assert p["bitrate"] == 128000  # first frame's

    def test_id3v2_tag_skipped(self):
        raw = audio.build_mp3_frames(10, id3=b"\x00" * 100)
        p = audio.probe_mp3(raw)
        assert p is not None and p["n_frames"] == 10

    def test_junk_prefix_resync(self):
        raw = b"\x12\x34" * 40 + audio.build_mp3_frames(6)
        p = audio.probe_mp3(raw)
        assert p is not None and p["n_frames"] == 6

    def test_false_sync_rejected(self):
        # a lone valid-looking header inside junk must not probe: the
        # walk requires a chained second frame
        hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
        assert audio.probe_mp3(b"junk" + hdr + b"\x00" * 50) is None
        assert audio.probe_mp3(b"\x00" * 64) is None

    def test_mono_22050(self):
        raw = audio.build_mp3_frames(5, sample_rate=48000, channels=1)
        p = audio.probe_mp3(raw)
        assert p["channels"] == 1 and p["sample_rate"] == 48000


class TestProbeBytesIntegration:
    def test_probe_bytes_mp3(self):
        raw = audio.build_mp3_frames(38, bitrate_kbps=128, sample_rate=44100)
        out = probe_bytes(raw)
        assert out["format"] == "mp3" and out["valid"]
        assert out["subformat"] == "mpeg1-layer3"
        assert out["channels"] == 2 and out["sample_rate"] == 44100
        assert out["duration_s"] == pytest.approx(38 * 1152 / 44100)

    def test_probe_bytes_mp3_vbr_subformat(self):
        raw = audio.build_mp3_frames(8, bitrate_schedule=[128, 320] * 4)
        assert probe_bytes(raw)["subformat"] == "mpeg1-layer3-vbr"

    def test_probe_bytes_id3_entry_point(self):
        raw = audio.build_mp3_frames(4, id3=b"\x00" * 30)
        out = probe_bytes(raw)
        assert out["format"] == "mp3" and out["valid"]

    def test_wav_still_wins(self):
        # RIFF magic takes the WAV branch, untouched by the mp3 one
        wav = audio.encode_wav(__import__("numpy").zeros(100, dtype="int16"), 8000)
        assert probe_bytes(wav)["format"] == "wav"

    def test_garbage_stays_unknown(self):
        assert probe_bytes(b"\x01\x02\x03\x04" * 10)["format"] == "unknown"
