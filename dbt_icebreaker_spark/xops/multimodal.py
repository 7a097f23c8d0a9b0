"""Multimodal columns (SURVEY §2.6 X4).

Image/audio/video are opaque ``binary`` columns with typed metadata.
Three tiers, by what this container can genuinely do:

1. REAL: container-format header probing (``probe_bytes`` /
   ``probe_media``) — PNG/GIF/JPEG dimensions and WAV
   channels/sample-rate/duration parsed from the bytes with pure
   Python (published file-format layouts, no PIL/ffmpeg needed). This
   is the metadata-extraction step of a real media pipeline and is
   fully tested, including a DuckDB-oracled corpus entry over
   synthesized-in-Spark PNG payloads.
2. REAL plumbing, fake kernel: ``extract_features`` (Arrow-batched
   mapInPandas, fixed output schema, deterministic `decode_stub`),
   ``resize_images`` (REAL PNG IHDR rewrite — probe-verifiable — with
   the pixel resampling stubbed behind a documented PIL one-liner) and
   ``sample_frames`` (the 1→N frame-explosion batch shape with a
   deterministic byte slicer where PyAV/ffmpeg would decode).
3. Contract stub: video decode raises NotImplementedError (needs
   ffmpeg; swapping it in is one line inside the pandas iterator).

Scale notes: binary payloads dominate partition size, so
``repartition_for_payloads`` targets ~128 MB of payload per task
(matching spark.sql.files.maxPartitionBytes); probing/decoding runs
inside mapInPandas so each Arrow batch is one Python call, not one
per row.
"""

from __future__ import annotations

import struct as _struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),   # image|audio|video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_json", StringType()),    # width/height/duration…
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("feature_json", StringType()),
    ]
)


def attach_binary_column(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a deterministic fake media table from a text corpus (test
    fixture path: the container has no real media). Payload = UTF-8
    bytes; the plumbing downstream treats it as opaque binary."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.length(F.col(text_col)).alias("n_chars"))).alias(
            "meta_json"
        ),
    )


def repartition_for_payloads(
    df: DataFrame,
    target_mb: int = 128,
    payload_col: str = "payload",
    total_bytes: Optional[int] = None,
) -> DataFrame:
    """Size partitions by MEASURED payload volume, not row count —
    binary media rows vary by orders of magnitude, so row-count
    partitioning gives some tasks gigabytes and others kilobytes.
    Costs one aggregate job when total_bytes isn't supplied (pass a
    known figure — e.g. from source file listing — to stay lazy)."""
    if total_bytes is None:
        total_bytes = (
            df.agg(F.sum(F.length(F.col(payload_col)))).collect()[0][0] or 0
        )
    n = max(1, int(total_bytes // (target_mb * 1024 * 1024)) + 1)
    return df.repartition(n, "media_id")


PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),       # png|gif|jpeg|wav|unknown
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("n_bytes", LongType()),
        StructField("valid", BooleanType()),
        # jpeg coding process: baseline|extended|progressive (null for
        # other formats) — a pipeline must know which payloads its
        # baseline decoder can handle before fanning out decode work
        StructField("subformat", StringType()),
        # EXIF tag 0x0112 (1-8; null when absent) — real-world photos
        # are routinely stored rotated, and resize/crop ops that
        # ignore orientation silently produce sideways training data
        StructField("orientation", IntegerType()),
    ]
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _exif_orientation(app1: bytes) -> Optional[int]:
    """EXIF orientation (tag 0x0112) from an APP1 payload: 'Exif\\0\\0'
    + TIFF header (II/MM byte order, magic 42, IFD0 offset) + IFD0
    walk over 12-byte entries. Returns 1-8 or None."""
    if not app1.startswith(b"Exif\x00\x00") or len(app1) < 16:
        return None
    tiff = app1[6:]
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        return None
    try:
        if _struct.unpack(bo + "H", tiff[2:4])[0] != 42:
            return None
        (ifd0,) = _struct.unpack(bo + "I", tiff[4:8])
        (count,) = _struct.unpack(bo + "H", tiff[ifd0 : ifd0 + 2])
        for e in range(count):
            off = ifd0 + 2 + 12 * e
            tag, typ = _struct.unpack(bo + "HH", tiff[off : off + 4])
            if tag == 0x0112 and typ == 3:  # SHORT
                (val,) = _struct.unpack(bo + "H", tiff[off + 8 : off + 10])
                return val if 1 <= val <= 8 else None
    except (_struct.error, IndexError):
        return None
    return None


def probe_bytes(raw: bytes) -> dict:
    """Parse container-format headers for typed media metadata — the
    real metadata-extraction step of a media pipeline, implementable
    without decode libraries because the layouts are published:

    - PNG: 8-byte magic, then the IHDR chunk; width/height are
      big-endian u32 at offsets 16/20.
    - GIF: 'GIF87a'/'GIF89a', logical screen size little-endian u16 at
      offsets 6/8.
    - JPEG: scan marker segments for SOF0/1/2 (0xC0-0xC2); height and
      width are big-endian u16 at +5/+7 inside the segment.
    - WAV: 'RIFF…WAVE'; the fmt chunk carries channels (u16 LE @22)
      and sample rate (u32 LE @24); duration derives from the data
      chunk size / byte rate.
    - MP4/ISO-BMFF: box walk (u32 size + 4cc, 64-bit largesize and
      run-to-EOF handled); moov→mvhd gives duration/timescale,
      moov→trak→tkhd gives 16.16-fixed track dimensions.
    """
    out: dict = {
        "format": "unknown", "width": None, "height": None,
        "channels": None, "sample_rate": None, "duration_s": None,
        "n_bytes": len(raw), "valid": False,
        "subformat": None, "orientation": None,
    }
    try:
        if raw.startswith(_PNG_MAGIC) and len(raw) >= 24:
            w, h = _struct.unpack(">II", raw[16:24])
            out.update(format="png", width=w, height=h, valid=True)
        elif raw[:6] in (b"GIF87a", b"GIF89a") and len(raw) >= 10:
            w, h = _struct.unpack("<HH", raw[6:10])
            out.update(format="gif", width=w, height=h, valid=True)
        elif raw[:2] == b"\xff\xd8":
            # marker scan per the JPEG spec: fill 0xFF bytes before a
            # marker are legal padding; TEM (0x01) and RST (0xD0-D7)
            # markers are standalone (NO length field); everything
            # else after SOI carries a big-endian length that includes
            # its own two bytes
            i = 2
            n = len(raw)
            while i + 1 < n:
                if raw[i] != 0xFF:
                    break
                marker = raw[i + 1]
                if marker == 0xFF:  # fill byte, marker continues
                    i += 1
                    continue
                if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone marker, no segment length
                    continue
                if marker in (0xC0, 0xC1, 0xC2) and i + 9 <= n:
                    h, w = _struct.unpack(">HH", raw[i + 5 : i + 9])
                    sub = {0xC0: "baseline", 0xC1: "extended",
                           0xC2: "progressive"}[marker]
                    out.update(format="jpeg", width=w, height=h,
                               subformat=sub, valid=True)
                    break
                if marker == 0xD9 or i + 4 > n:  # EOI / truncated
                    break
                seg_len = _struct.unpack(">H", raw[i + 2 : i + 4])[0]
                if seg_len < 2:
                    break  # malformed length, stop rather than loop
                if marker == 0xE1:  # APP1: EXIF (precedes SOF in files)
                    ori = _exif_orientation(raw[i + 4 : i + 2 + seg_len])
                    if ori is not None:
                        out["orientation"] = ori
                i += 2 + seg_len
            if out["format"] == "unknown":
                out.update(format="jpeg")  # magic matched, no SOF found
        elif len(raw) >= 12 and raw[4:8] == b"ftyp":
            # MP4 / ISO-BMFF (ISO 14496-12): a sequence of boxes
            # [u32 BE size][4cc type], size==1 → u64 largesize follows,
            # size==0 → box runs to EOF. moov is a pure container;
            # mvhd carries timescale+duration (v0: u32s after 4-byte
            # version/flags + 2×u32 times; v1: u64 times/duration),
            # tkhd carries 16.16-fixed track width/height at +76 (v0)
            # / +88 (v1) past the version byte.
            def _boxes(lo: int, hi: int):
                i2 = lo
                while i2 + 8 <= hi:
                    size = _struct.unpack(">I", raw[i2:i2 + 4])[0]
                    typ = raw[i2 + 4:i2 + 8]
                    hdr = 8
                    if size == 1 and i2 + 16 <= hi:
                        size = _struct.unpack(">Q", raw[i2 + 8:i2 + 16])[0]
                        hdr = 16
                    elif size == 0:
                        size = hi - i2
                    if size < hdr:
                        break
                    yield typ, i2 + hdr, min(i2 + size, hi)
                    i2 += size

            # tag the container as soon as the magic matches, like
            # the JPEG/WAV branches: a truncated moov still reports
            # format='mp4' with best-effort metadata
            out.update(format="mp4")
            dur = width = height = None
            for typ, lo, hi in _boxes(0, len(raw)):
                if typ != b"moov":
                    continue
                for t2, l2, h2 in _boxes(lo, hi):
                    if t2 == b"mvhd" and h2 - l2 >= 20:
                        ver = raw[l2]
                        if ver == 1 and h2 - l2 >= 32:
                            ts = _struct.unpack(">I", raw[l2 + 20:l2 + 24])[0]
                            d = _struct.unpack(">Q", raw[l2 + 24:l2 + 32])[0]
                        else:
                            ts = _struct.unpack(">I", raw[l2 + 12:l2 + 16])[0]
                            d = _struct.unpack(">I", raw[l2 + 16:l2 + 20])[0]
                        if ts:
                            dur = d / ts
                    elif t2 == b"trak":
                        for t3, l3, h3 in _boxes(l2, h2):
                            if t3 != b"tkhd" or h3 - l3 < 1:
                                continue
                            off = 88 if raw[l3] == 1 else 76
                            if h3 - l3 >= off + 8 and width is None:
                                w_fx, h_fx = _struct.unpack(
                                    ">II", raw[l3 + off:l3 + off + 8])
                                if w_fx and h_fx:
                                    width = w_fx >> 16
                                    height = h_fx >> 16
            out.update(
                duration_s=dur, width=width, height=height,
                valid=dur is not None,
            )
        elif raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
            # walk the RIFF chunk list instead of assuming the
            # 44-byte canonical layout: editors commonly emit LIST/
            # fact chunks before data (and extended fmt chunks), which
            # fixed offsets would misread as garbage marked valid
            channels = rate = byte_rate = data_size = None
            i = 12
            n = len(raw)
            while i + 8 <= n:
                cid = raw[i : i + 4]
                size = _struct.unpack("<I", raw[i + 4 : i + 8])[0]
                if cid == b"fmt " and i + 24 <= n:
                    channels = _struct.unpack("<H", raw[i + 10 : i + 12])[0]
                    rate = _struct.unpack("<I", raw[i + 12 : i + 16])[0]
                    byte_rate = _struct.unpack("<I", raw[i + 16 : i + 20])[0]
                elif cid == b"data":
                    data_size = size
                # chunks are word-aligned: odd sizes carry a pad byte
                i += 8 + size + (size % 2)
            if channels is not None and data_size is not None:
                out.update(
                    format="wav", channels=channels, sample_rate=rate,
                    duration_s=(data_size / byte_rate) if byte_rate else None,
                    valid=True,
                )
            else:
                out.update(format="wav")  # magic matched, chunks missing
        elif raw[:3] == b"ID3" or (
            len(raw) > 4 and raw[0] == 0xFF and (raw[1] & 0xE0) == 0xE0
        ):
            # MPEG audio: frame-header walk (no DSP decode) gives
            # codec fields + exact VBR-safe duration — audio.probe_mp3
            from . import audio as _audio

            mp3 = _audio.probe_mp3(raw)
            if mp3 is not None:
                out.update(
                    format="mp3",
                    channels=mp3["channels"],
                    sample_rate=mp3["sample_rate"],
                    duration_s=mp3["duration_s"],
                    subformat=f"mpeg{mp3['version']}-layer{mp3['layer']}"
                    + ("-vbr" if mp3["vbr"] else ""),
                    valid=True,
                )
    except Exception:
        pass  # malformed header → valid=False row, never a task failure
    return out


def probe_media(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """mapInPandas media probe: binary column → typed metadata rows
    (PROBE_SCHEMA). One Python call per Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [probe_bytes(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(rows)
            out["media_id"] = pdf[id_col].values
            yield out[[f.name for f in PROBE_SCHEMA.fields]]

    return df.mapInPandas(run, PROBE_SCHEMA)


def synthesize_png_corpus(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic REAL-PNG-header payloads from a text corpus (no
    media fixtures exist in the test data): width/height derive from
    the id, the text bytes ride along as fake pixel data. Built
    JVM-side (unhex/concat/encode — no UDF), so synthesis scales like
    any projection and `probe_media` round-trips it exactly."""
    w = (F.col(id_col) % 640 + 16).cast("long")
    h = (F.col(id_col) % 480 + 16).cast("long")
    header_hex = F.concat(
        F.lit("89504E470D0A1A0A"),            # PNG magic
        F.lit("0000000D49484452"),            # IHDR length + type
        F.lpad(F.hex(w), 8, "0"),
        F.lpad(F.hex(h), 8, "0"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.lit("image/png").alias("mime"),
        F.concat(F.unhex(header_hex), F.encode(F.col(text_col), "UTF-8")).alias(
            "payload"
        ),
        F.to_json(F.struct(w.alias("width"), h.alias("height"))).alias("meta_json"),
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Batch image resize over binary payloads (MEDIA_SCHEMA in and
    out). The header-level work is REAL: for PNG payloads the IHDR
    width/height words are rewritten to the target, so a subsequent
    ``probe_media`` reads the new dimensions straight from the bytes
    (round-trip oracled in corpus x29). The pixel resampling itself is
    the stubbed kernel — a real deployment replaces the byte splice
    with ``PIL.Image.open(...).resize((width, height)).save(...)``
    inside the same iterator; nothing else changes (schema, Arrow
    batching, payload-sized partitioning via
    ``repartition_for_payloads`` all carry over).

    Non-PNG payloads pass through unchanged with ``resized: false`` in
    meta_json — a quarantine-not-crash policy, matching probe_bytes'
    malformed-header stance."""
    import json

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                info = probe_bytes(raw)
                if info["format"] == "png" and info["valid"]:
                    new = raw[:16] + _struct.pack(">II", width, height) + raw[24:]
                    meta = {"width": width, "height": height, "resized": True,
                            "src_width": info["width"], "src_height": info["height"]}
                else:
                    new = raw
                    meta = {"resized": False, "format": info["format"]}
                payloads.append(new)
                metas.append(json.dumps(meta, sort_keys=True))
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "mime": pdf["mime"].values,
                    "payload": payloads,
                    "meta_json": metas,
                }
            )
            yield out[[f.name for f in MEDIA_SCHEMA.fields]]

    return df.mapInPandas(run, MEDIA_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_s", DoubleType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    fps: float = 1.0,
    max_frames: int = 8,
    frame_bytes: int = 256,
) -> DataFrame:
    """Frame sampling: one input row → N frame rows (FRAME_SCHEMA).
    This is the 1→N mapInPandas shape a real video pipeline needs —
    pandas batches in, a longer frame batch out, fixed schema so
    downstream SQL/dedup/embedding ops compose. The decoder is the
    stubbed kernel: frames here are deterministic byte slices of the
    payload; a real deployment swaps the slicer for PyAV/ffmpeg
    keyframe extraction inside the same iterator (the container has no
    media libs — documented stub, tiers in the module docstring).

    Scale note: frame explosion multiplies payload volume by up to
    ``max_frames`` — run ``repartition_for_payloads`` BEFORE this op
    so the post-explosion partitions stay near the 128 MB target."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FRAME_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n = min(max_frames, max(1, len(raw) // frame_bytes))
                for k in range(n):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": k,
                            "ts_s": k / fps,
                            "frame_payload": raw[k * frame_bytes:(k + 1) * frame_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, FRAME_SCHEMA)


def decode_stub(payload: bytes, media_type: str) -> dict:
    """Decode kernel with a REAL path: PNG payloads go through the
    pure-numpy PNG decoder (xops/imaging.py — stdlib zlib + the
    published filter spec) and return actual pixel statistics. Other
    image formats fall back to the deterministic fake (JPEG needs a
    codec); video raises to demonstrate the NotImplementedError
    contract (needs ffmpeg)."""
    if media_type == "video":
        raise NotImplementedError("video decode requires ffmpeg — not in container")
    from .imaging import _luma, decode_png

    px = decode_png(payload)
    if px is not None:
        h, w, c = px.shape
        return {
            "decoded": "png",
            "width": w,
            "height": h,
            "channels": c,
            "mean_luma": round(float(_luma(px).mean()), 6),
        }
    return {"n_bytes": len(payload), "fake_dim": len(payload) % 224}


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow delivers each partition as pandas batches; one Python call
    per batch (not per row). Output schema is fixed (FEATURE_SCHEMA)
    so downstream SQL composes normally.
    """
    import hashlib
    import json

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                raw = bytes(payload)
                try:
                    d = decode_stub(raw, mtype)
                except NotImplementedError:
                    d = {"error": "unsupported_media"}
                feats.append(
                    {
                        "n_bytes": len(raw),
                        "payload_md5": hashlib.md5(raw).hexdigest(),
                        "feature_json": json.dumps(d, sort_keys=True),
                    }
                )
            out = pd.DataFrame(feats)
            out["media_id"] = pdf["media_id"].values
            out["media_type"] = pdf["media_type"].values
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return df.mapInPandas(run, FEATURE_SCHEMA)
