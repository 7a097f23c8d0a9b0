"""REAL audio decode + DSP ops over PCM WAV (SURVEY §2.6 X4 upgrade).

PCM WAV needs no codec: the RIFF layout is published and the samples
are raw int16, so decode is a chunk walk + ``np.frombuffer``. That
makes waveform statistics (RMS energy, peak, zero-crossing rate) and
time-domain segmentation REAL operations here — actual sample math,
not plumbing around a stub — leaving only compressed codecs (mp3/aac)
as documented stubs.

The corpus entries are SQL-oracled the same way as the imaging ops:
synthesized square waves have closed-form statistics (|x|=A
everywhere → RMS = peak = A exactly, alternating signs → n-1 zero
crossings), so DuckDB recomputes every expected value from the row id
without touching a byte. A single mis-parsed sample or header offset
changes RMS and breaks the value hash.

Scale notes: decode + stats run inside ``mapInPandas`` (one Python
call per Arrow batch); sample arrays never leave the executor — only
fixed-width stats rows shuffle. Segmentation multiplies row count but
SPLITS payload bytes (each segment carries its slice), so volume is
conserved; run ``multimodal.repartition_for_payloads`` first on
skewed media tables.
"""

from __future__ import annotations

import struct as _struct
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


# ------------------------------------------------------------------ codec
def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Minimal REAL PCM WAV encoder (int16, interleaved channels) for
    distributed fixture synthesis and segment re-emission: canonical
    44-byte header + raw samples."""
    pcm = samples.astype("<i2").tobytes()
    block_align = 2 * channels
    byte_rate = sample_rate * block_align
    return (
        b"RIFF"
        + _struct.pack("<I", 36 + len(pcm))
        + b"WAVEfmt "
        + _struct.pack(
            "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, 16
        )
        + b"data"
        + _struct.pack("<I", len(pcm))
        + pcm
    )


def decode_wav(raw: bytes) -> Optional[Tuple[np.ndarray, int, int]]:
    """RIFF chunk walk → (samples[int16], sample_rate, channels).
    Handles non-canonical layouts (LIST/fact chunks before data,
    word-aligned odd sizes). Returns None for non-PCM-16 or malformed
    payloads (quarantine-not-crash, as everywhere in X4)."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    channels = rate = bits = None
    data = None
    i, n = 12, len(raw)
    while i + 8 <= n:
        cid = raw[i : i + 4]
        size = _struct.unpack("<I", raw[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            fmt_code, channels, rate = _struct.unpack("<HHI", raw[i + 8 : i + 16])
            bits = _struct.unpack("<H", raw[i + 22 : i + 24])[0]
            if fmt_code != 1:  # non-PCM
                return None
        elif cid == b"data":
            data = raw[i + 8 : i + 8 + size]
        i += 8 + size + (size % 2)
    if data is None or channels is None or bits != 16:
        return None
    usable = len(data) - (len(data) % (2 * channels))
    samples = np.frombuffer(data[:usable], dtype="<i2")
    return samples, rate, channels


# ------------------------------------------------------------- mp3 probe
# MPEG audio DSP decode stays a documented stub (no codec libs in the
# container), but the 4-byte frame header is a published bit layout
# (ISO 11172-3 §2.4.1.3 / ISO 13818-3), so PROBING — version/layer/
# bitrate/sample-rate/channels and an exact frame-walk duration (VBR
# included) — needs no DSP at all. Same shape as the H.264 SPS story:
# real metadata for compressed corpora, honest decode stub.

_MP3_BITRATES = {
    # (version_group, layer) -> kbps by 4-bit index (index 0 = free, 15 = bad)
    ("1", 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("2", 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {
    # version bits (00=2.5, 10=2, 11=1) -> sample rates by 2-bit index
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def parse_mp3_frame_header(hdr: bytes) -> Optional[dict]:
    """One 4-byte MPEG audio frame header → fields + frame_bytes, or
    None if the sync/indices are invalid."""
    if len(hdr) < 4 or hdr[0] != 0xFF or (hdr[1] & 0xE0) != 0xE0:
        return None
    version_bits = (hdr[1] >> 3) & 0x03
    layer_bits = (hdr[1] >> 1) & 0x03
    if version_bits == 1 or layer_bits == 0:
        return None  # reserved
    layer = 4 - layer_bits  # bits 11→Layer I, 10→II, 01→III
    vgroup = "1" if version_bits == 3 else "2"
    br_idx = (hdr[2] >> 4) & 0x0F
    sr_idx = (hdr[2] >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3 or version_bits not in _MP3_RATES:
        return None  # free-format/bad bitrate or reserved rate
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx] * 1000
    sample_rate = _MP3_RATES[version_bits][sr_idx]
    padding = (hdr[2] >> 1) & 0x01
    channel_mode = (hdr[3] >> 6) & 0x03
    # samples per frame: Layer I 384; Layer II 1152; Layer III 1152
    # (MPEG-1) / 576 (MPEG-2/2.5)
    if layer == 1:
        spf = 384
        frame_bytes = (12 * bitrate // sample_rate + padding) * 4
    else:
        spf = 576 if (layer == 3 and vgroup == "2") else 1152
        frame_bytes = spf // 8 * bitrate // sample_rate + padding
    version_name = {3: "1", 2: "2", 0: "2.5"}[version_bits]
    return {
        "version": version_name,
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": sample_rate,
        "channels": 1 if channel_mode == 3 else 2,
        "padding": padding,
        "samples_per_frame": spf,
        "frame_bytes": frame_bytes,
    }


def _skip_id3v2(raw: bytes) -> int:
    """Offset past a leading ID3v2 tag (syncsafe 28-bit size), else 0."""
    if raw[:3] != b"ID3" or len(raw) < 10:
        return 0
    size = ((raw[6] & 0x7F) << 21) | ((raw[7] & 0x7F) << 14) \
        | ((raw[8] & 0x7F) << 7) | (raw[9] & 0x7F)
    return 10 + size


def probe_mp3(raw: bytes, max_resync: int = 4096) -> Optional[dict]:
    """Walk MPEG audio frames (no DSP): first-frame codec fields plus
    exact duration = Σ samples_per_frame / sample_rate over every
    frame, which is correct for VBR streams where the first frame's
    bitrate misleads. Resyncs over ≤``max_resync`` junk bytes before
    the first frame (common after mis-sized ID3 tags); returns None if
    no two consecutive valid frames are found (a lone 0xFFE pattern in
    random bytes is a false sync ~1/2048 — requiring the walk to chain
    kills those)."""
    i = _skip_id3v2(raw)
    n = len(raw)
    first = None
    start = i
    while i < min(n - 4, start + max_resync):
        h = parse_mp3_frame_header(raw[i:i + 4])
        if h:
            nxt = i + h["frame_bytes"]
            # accept only a chained second header OR a single COMPLETE
            # frame ending at (near) EOF — a false sync in junk fails
            # both (its phantom frame runs past the buffer)
            if (nxt + 4 <= n and parse_mp3_frame_header(raw[nxt:nxt + 4])) or (
                nxt <= n and n - nxt < 4
            ):
                first = h
                break
        i += 1
    if first is None:
        return None
    n_frames = 0
    dur = 0.0
    bitrates = set()
    while i + 4 <= n:
        h = parse_mp3_frame_header(raw[i:i + 4])
        if h is None:
            break  # trailing tag (ID3v1 etc.) or junk ends the walk
        n_frames += 1
        dur += h["samples_per_frame"] / h["sample_rate"]
        bitrates.add(h["bitrate"])
        i += h["frame_bytes"]
    return {
        "version": first["version"],
        "layer": first["layer"],
        "bitrate": first["bitrate"],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "n_frames": n_frames,
        "duration_s": dur,
        "vbr": len(bitrates) > 1,
    }


def build_mp3_frames(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    id3: bytes = b"",
    bitrate_schedule: Optional[list] = None,
) -> bytes:
    """Deterministic MPEG-1 Layer III fixture: valid frame headers with
    zeroed (silent, undecodable) payloads — byte-exact for probe tests,
    honest about not being playable audio. ``bitrate_schedule``
    overrides per-frame kbps to synthesize VBR streams."""
    out = bytearray()
    if id3:
        body = id3
        size = len(body)
        hdr = b"ID3\x03\x00\x00" + bytes([
            (size >> 21) & 0x7F, (size >> 14) & 0x7F,
            (size >> 7) & 0x7F, size & 0x7F,
        ])
        out += hdr + body
    rates = _MP3_RATES[3]
    sr_idx = rates.index(sample_rate)
    table = _MP3_BITRATES[("1", 3)]
    for f in range(n_frames):
        kbps = bitrate_schedule[f] if bitrate_schedule else bitrate_kbps
        br_idx = table.index(kbps)
        b0 = 0xFF
        b1 = 0xE0 | (3 << 3) | (1 << 1) | 1  # MPEG-1, Layer III, no CRC
        b2 = (br_idx << 4) | (sr_idx << 2)
        b3 = (0xC0 if channels == 1 else 0x00)
        frame_len = 144 * kbps * 1000 // sample_rate
        out += bytes([b0, b1, b2, b3]) + b"\x00" * (frame_len - 4)
    return bytes(out)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
        StructField("zero_crossings", LongType()),
        StructField("ok", BooleanType()),
    ]
)


def audio_stats(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Waveform statistics from REAL decoded PCM samples: RMS energy,
    peak amplitude, zero-crossing count — the standard cheap features
    for silence/clipping/quality filtering of an audio corpus."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_STATS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = decode_wav(bytes(payload))
                if dec is None:
                    rows.append(
                        dict.fromkeys(cols) | {"media_id": int(mid), "ok": False}
                    )
                    continue
                samples, rate, ch = dec
                x = samples.astype(np.float64)
                n = len(samples) // ch
                # crossings PER CHANNEL, summed — diff over raw
                # interleaved stereo would count an L/R sign flip at
                # every frame as a "crossing"
                zc = 0
                planes = x[: n * ch].reshape(n, ch) if n else x.reshape(0, ch)
                for c0 in range(ch):
                    col = planes[:, c0]
                    signs = np.sign(col)
                    nz = signs != 0
                    zc += int(np.count_nonzero(np.diff(signs[nz]) != 0))
                rows.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": rate,
                        "channels": ch,
                        "n_samples": n,
                        "duration_s": n / rate if rate else None,
                        "rms": float(np.sqrt(np.mean(x * x))) if n else 0.0,
                        "peak": int(np.max(np.abs(x))) if n else 0,
                        "zero_crossings": zc,
                        "ok": True,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, AUDIO_STATS_SCHEMA)


SEGMENT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("seg_idx", IntegerType()),
        StructField("start_s", DoubleType()),
        StructField("payload", BinaryType()),
    ]
)


def segment_audio(
    df: DataFrame,
    window_s: float,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL time-domain segmentation: slice the PCM data on
    sample-aligned window boundaries and re-emit each slice as a
    complete, valid WAV (fresh RIFF/fmt/data headers) — downstream
    ops (stats, feature extraction, ASR batching) compose on segments
    exactly as on whole files. 1→N mapInPandas shape; the final
    segment is shorter (no padding)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SEGMENT_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = decode_wav(bytes(payload))
                if dec is None:
                    continue
                samples, rate, ch = dec
                win = max(1, int(round(window_s * rate))) * ch
                for idx, lo in enumerate(range(0, len(samples), win)):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "seg_idx": idx,
                            "start_s": (lo // ch) / rate,
                            # header carries the SOURCE channel count —
                            # a stereo segment re-encoded as mono would
                            # double its apparent duration
                            "payload": encode_wav(
                                samples[lo : lo + win], rate, channels=ch
                            ),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, SEGMENT_SCHEMA)


def synthesize_wav_corpus(
    df: DataFrame, id_col: str, sample_rate: int = 8000
) -> DataFrame:
    """Distributed synthesis of REAL PCM WAVs with closed-form
    statistics: row k is a square wave of amplitude A = 1000 +
    (k % 20000), alternating +A/−A for n = 800 + (k % 7)·160 samples.
    Every waveform statistic is pure arithmetic in k: RMS = peak = A,
    zero crossings = n − 1, duration = n / rate — which is what lets
    the DuckDB oracle hash-verify the decode + DSP path."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for k in pdf[id_col]:
                k = int(k)
                n = 800 + (k % 7) * 160
                amp = 1000 + (k % 20000)
                wave = np.where(np.arange(n) % 2 == 0, amp, -amp).astype(np.int16)
                out.append({"media_id": k, "payload": encode_wav(wave, sample_rate)})
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return df.mapInPandas(run, schema)
