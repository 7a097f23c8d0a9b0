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
