"""REAL video frame extraction for MJPEG-in-MP4 (SURVEY §2.6 X6/X4
video tier — upgrades `sample_frames`' byte-slicer stub to a true
container demux + codec decode path).

All layouts are published (ISO/IEC 14496-12):

- ``demux_mp4_samples``: box walk → stbl sample tables (stsd fourcc,
  stts timing, stsc sample→chunk, stsz sizes, stco/co64 offsets) →
  per-sample (offset, size, timestamp). Works on any ISO-BMFF file;
  frame DECODE is only wired for Motion-JPEG tracks ('jpeg'/'mjpa'
  sample entries), whose samples are plain baseline JPEG images that
  ``xops/jpeg.py`` decodes — H.264/H.265/VP9 payloads still demux
  (offsets/sizes/timestamps are real) but decode stays a documented
  stub (an entropy-coded inter-frame codec is out of scope without
  media libs).
- ``mux_mjpeg_mp4``: minimal single-track muxer (ftyp + mdat + moov
  with a complete stbl) used to synthesize REAL decodable fixtures
  distributed-side; output demuxes with this module AND any spec
  demuxer.
- ``extract_frames_mp4``: mapInPandas 1→N frame explosion emitting
  the FRAME_SCHEMA rows of `multimodal.sample_frames`, but with real
  sample payloads and container timestamps. Composes directly with
  ``imaging.image_stats`` (decode_image handles the JPEG payloads) —
  the corpus entry hash-verifies mux → demux → sample-select →
  Huffman/DCT decode → pixel stats end to end.

Scale notes: demux reads only the moov tables (a few KB) plus the
selected samples' byte ranges; frame explosion multiplies payload
volume by ≤ max_frames, so run `repartition_for_payloads` upstream —
same envelope as sample_frames. Nothing leaves the executor except
the emitted frames.
"""

from __future__ import annotations

import struct as _struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

from .multimodal import FRAME_SCHEMA

_MJPEG_FOURCC = (b"jpeg", b"mjpa", b"mjpb", b"AVDJ")


# ------------------------------------------------------------- demux
def _boxes(raw: bytes, lo: int, hi: int):
    i = lo
    while i + 8 <= hi:
        (size,) = _struct.unpack(">I", raw[i : i + 4])
        typ = raw[i + 4 : i + 8]
        hdr = 8
        if size == 1 and i + 16 <= hi:
            (size,) = _struct.unpack(">Q", raw[i + 8 : i + 16])
            hdr = 16
        elif size == 0:
            size = hi - i
        if size < hdr:
            return
        yield typ, i + hdr, min(i + size, hi)
        i += size


def _find(raw: bytes, lo: int, hi: int, path: tuple[bytes, ...]):
    """First box matching the nested path; returns (lo, hi) or None."""
    if not path:
        return lo, hi
    for typ, blo, bhi in _boxes(raw, lo, hi):
        if typ == path[0]:
            return _find(raw, blo, bhi, path[1:])
    return None


def demux_mp4_samples(raw: bytes) -> Optional[dict]:
    """Sample layout of the FIRST video track: {codec, timescale,
    samples: [(offset, size, ts_units), ...]}. None when the payload
    is not ISO-BMFF or the tables are incomplete."""
    if len(raw) < 12 or raw[4:8] != b"ftyp":
        return None
    try:
        return _demux(raw)
    except (_struct.error, IndexError, ValueError):
        return None  # truncated/malformed tables quarantine, never raise


def _demux(raw: bytes) -> Optional[dict]:
    moov = _find(raw, 0, len(raw), (b"moov",))
    if moov is None:
        return None
    for typ, tlo, thi in _boxes(raw, *moov):
        if typ != b"trak":
            continue
        mdia = _find(raw, tlo, thi, (b"mdia",))
        if mdia is None:
            continue
        hdlr = _find(raw, *mdia, (b"hdlr",))
        if hdlr is None or raw[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(raw, *mdia, (b"mdhd",))
        stbl = _find(raw, *mdia, (b"minf", b"stbl"))
        if mdhd is None or stbl is None:
            return None
        ver = raw[mdhd[0]]
        (timescale,) = _struct.unpack(
            ">I", raw[mdhd[0] + (20 if ver else 12) : mdhd[0] + (24 if ver else 16)]
        )
        tables: dict[bytes, tuple[int, int]] = {}
        for t2, l2, h2 in _boxes(raw, *stbl):
            tables[t2] = (l2, h2)
        if b"stsd" not in tables or b"stsz" not in tables:
            return None
        slo, shi = tables[b"stsd"]
        codec = raw[slo + 12 : slo + 16].decode("latin1")
        # AVC tracks: the avcC configuration record (SPS/PPS) sits
        # after the 78-byte VisualSampleEntry header — parse it for
        # profile/level and the TRUE coded dimensions (tkhd is a
        # display transform, not the coded size). 14496-15 §5.2.4.
        h264_info = None
        if codec in ("avc1", "avc3", "avc2", "avc4"):
            from . import h264 as _h264

            entry_lo = slo + 8  # past stsd ver/flags + entry_count
            ext_lo = entry_lo + 8 + 78  # past size+fourcc+sample entry
            for t3, l3, h3 in _boxes(raw, ext_lo, shi):
                if t3 == b"avcC":
                    h264_info = _h264.parse_avcc(raw[l3:h3])
                    break
        # stss sync-sample table → keyframe sample numbers (1-based);
        # absent table means EVERY sample is a sync point (14496-12)
        keyframes: Optional[list[int]] = None
        if b"stss" in tables:
            klo, _ = tables[b"stss"]
            (nkf,) = _struct.unpack(">I", raw[klo + 4 : klo + 8])
            keyframes = list(
                _struct.unpack(f">{nkf}I", raw[klo + 8 : klo + 8 + 4 * nkf])
            )
        # stsz: u32 ver/flags, u32 uniform_size, u32 count [, sizes]
        zlo, _ = tables[b"stsz"]
        uniform, count = _struct.unpack(">II", raw[zlo + 4 : zlo + 12])
        if uniform:
            sizes = [uniform] * count
        else:
            sizes = list(
                _struct.unpack(f">{count}I", raw[zlo + 12 : zlo + 12 + 4 * count])
            )
        # stco/co64 chunk offsets
        if b"stco" in tables:
            clo, _ = tables[b"stco"]
            (nch,) = _struct.unpack(">I", raw[clo + 4 : clo + 8])
            offs = list(_struct.unpack(f">{nch}I", raw[clo + 8 : clo + 8 + 4 * nch]))
        elif b"co64" in tables:
            clo, _ = tables[b"co64"]
            (nch,) = _struct.unpack(">I", raw[clo + 4 : clo + 8])
            offs = list(_struct.unpack(f">{nch}Q", raw[clo + 8 : clo + 8 + 8 * nch]))
        else:
            return None
        # stsc: runs of (first_chunk, samples_per_chunk, desc_idx)
        if b"stsc" in tables:
            plo, _ = tables[b"stsc"]
            (nrun,) = _struct.unpack(">I", raw[plo + 4 : plo + 8])
            runs = [
                _struct.unpack(">III", raw[plo + 8 + 12 * r : plo + 20 + 12 * r])
                for r in range(nrun)
            ]
        else:
            runs = [(1, count, 1)]
        # stts: runs of (sample_count, delta)
        ts_units = []
        if b"stts" in tables:
            tlo2, _ = tables[b"stts"]
            (ntt,) = _struct.unpack(">I", raw[tlo2 + 4 : tlo2 + 8])
            t = 0
            for r in range(ntt):
                cnt, delta = _struct.unpack(
                    ">II", raw[tlo2 + 8 + 8 * r : tlo2 + 16 + 8 * r]
                )
                for _ in range(cnt):
                    ts_units.append(t)
                    t += delta
        if len(ts_units) < count:
            ts_units += [0] * (count - len(ts_units))
        # expand sample → (offset, size, ts)
        samples = []
        si = 0
        for ri, (first, per_chunk, _desc) in enumerate(runs):
            last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(offs)
            for ch in range(first - 1, last):
                if ch >= len(offs) or si >= count:
                    break
                pos = offs[ch]
                for _ in range(per_chunk):
                    if si >= count:
                        break
                    samples.append((pos, sizes[si], ts_units[si]))
                    pos += sizes[si]
                    si += 1
        if si < count:
            return None
        return {
            "codec": codec,
            "timescale": timescale,
            "samples": samples,
            "keyframes": keyframes,
            "h264": h264_info,
        }
    return None


# ------------------------------------------------------------- mux
def mux_mjpeg_mp4(
    frames: list[bytes], fps: int = 10, width: int = 0, height: int = 0
) -> bytes:
    """Minimal single-track Motion-JPEG MP4: ftyp + mdat(samples) +
    moov with complete stbl. 'jpeg' VisualSampleEntry per the QuickTime
    MJPEG registration; spec demuxers read it."""

    def box(typ: bytes, body: bytes) -> bytes:
        return _struct.pack(">I", len(body) + 8) + typ + body

    def full(typ: bytes, ver: int, flags: int, body: bytes) -> bytes:
        return box(typ, _struct.pack(">I", (ver << 24) | flags) + body)

    n = len(frames)
    timescale = 1000
    delta = timescale // fps
    duration = n * delta
    ftyp = box(b"ftyp", b"isom" + _struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_body = b"".join(frames)
    # chunk data offset = after ftyp + mdat header (8 bytes)
    chunk_off = len(ftyp) + 8
    mdat = box(b"mdat", mdat_body)

    mvhd = full(
        b"mvhd", 0, 0,
        _struct.pack(">II", 0, 0) + _struct.pack(">II", timescale, duration)
        + _struct.pack(">I", 0x00010000) + _struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + _struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + _struct.pack(">I", 2),
    )
    tkhd = full(
        b"tkhd", 0, 7,
        _struct.pack(">II", 0, 0) + _struct.pack(">II", 1, 0)
        + _struct.pack(">I", duration) + b"\x00" * 16
        + _struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + _struct.pack(">II", width << 16, height << 16),
    )
    mdhd = full(
        b"mdhd", 0, 0,
        _struct.pack(">II", 0, 0) + _struct.pack(">II", timescale, duration)
        + _struct.pack(">HH", 0x55C4, 0),  # 'und' language
    )
    hdlr = full(b"hdlr", 0, 0, _struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"MJPEG\x00")
    vmhd = full(b"vmhd", 0, 1, _struct.pack(">HHHH", 0, 0, 0, 0))
    dref = full(b"dref", 0, 0, _struct.pack(">I", 1) + full(b"url ", 0, 1, b""))
    dinf = box(b"dinf", dref)
    sample_entry = box(
        b"jpeg",
        b"\x00" * 6 + _struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + _struct.pack(">HH", width, height)
        + _struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + _struct.pack(">I", 0) + _struct.pack(">H", 1)  # frame_count
        + b"\x05MJPEG" + b"\x00" * 26  # 32-byte compressorname
        + _struct.pack(">Hh", 24, -1),
    )
    stsd = full(b"stsd", 0, 0, _struct.pack(">I", 1) + sample_entry)
    stts = full(b"stts", 0, 0, _struct.pack(">III", 1, n, delta))
    stsc = full(b"stsc", 0, 0, _struct.pack(">IIII", 1, 1, n, 1))
    stsz = full(
        b"stsz", 0, 0,
        _struct.pack(">II", 0, n) + b"".join(_struct.pack(">I", len(f)) for f in frames),
    )
    stco = full(b"stco", 0, 0, _struct.pack(">II", 1, chunk_off))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def mux_avc_mp4(
    samples: list[bytes],
    avcc: bytes,
    keyframes: Optional[list[int]] = None,
    fps: int = 10,
    width: int = 0,
    height: int = 0,
) -> bytes:
    """Minimal single-track AVC (H.264) MP4 fixture: identical stbl
    shape to ``mux_mjpeg_mp4`` but with an `avc1` VisualSampleEntry
    carrying the given avcC configuration record (build one with
    ``h264.build_avcc``) and an optional stss sync-sample table
    (1-based keyframe numbers). Samples are opaque byte blobs — this
    muxer exists so demux/probe tests exercise the real avc1/stss
    layout without vendored media files."""

    def box(typ: bytes, body: bytes) -> bytes:
        return _struct.pack(">I", len(body) + 8) + typ + body

    def full(typ: bytes, ver: int, flags: int, body: bytes) -> bytes:
        return box(typ, _struct.pack(">I", (ver << 24) | flags) + body)

    n = len(samples)
    timescale = 1000
    delta = timescale // fps
    duration = n * delta
    ftyp = box(b"ftyp", b"isom" + _struct.pack(">I", 512) + b"isomiso2avc1")
    chunk_off = len(ftyp) + 8
    mdat = box(b"mdat", b"".join(samples))
    mvhd = full(
        b"mvhd", 0, 0,
        _struct.pack(">II", 0, 0) + _struct.pack(">II", timescale, duration)
        + _struct.pack(">I", 0x00010000) + _struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + _struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + _struct.pack(">I", 2),
    )
    tkhd = full(
        b"tkhd", 0, 7,
        _struct.pack(">II", 0, 0) + _struct.pack(">II", 1, 0)
        + _struct.pack(">I", duration) + b"\x00" * 16
        + _struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + _struct.pack(">II", width << 16, height << 16),
    )
    mdhd = full(
        b"mdhd", 0, 0,
        _struct.pack(">II", 0, 0) + _struct.pack(">II", timescale, duration)
        + _struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = full(b"hdlr", 0, 0, _struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"AVC\x00")
    vmhd = full(b"vmhd", 0, 1, _struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = box(b"dinf", full(b"dref", 0, 0, _struct.pack(">I", 1) + full(b"url ", 0, 1, b"")))
    sample_entry = box(
        b"avc1",
        b"\x00" * 6 + _struct.pack(">H", 1)
        + b"\x00" * 16
        + _struct.pack(">HH", width, height)
        + _struct.pack(">II", 0x00480000, 0x00480000)
        + _struct.pack(">I", 0) + _struct.pack(">H", 1)
        + b"\x03AVC" + b"\x00" * 28  # 32-byte compressorname
        + _struct.pack(">Hh", 24, -1)
        + box(b"avcC", avcc),
    )
    stsd = full(b"stsd", 0, 0, _struct.pack(">I", 1) + sample_entry)
    stts = full(b"stts", 0, 0, _struct.pack(">III", 1, n, delta))
    stsc = full(b"stsc", 0, 0, _struct.pack(">IIII", 1, 1, n, 1))
    stsz = full(
        b"stsz", 0, 0,
        _struct.pack(">II", 0, n) + b"".join(_struct.pack(">I", len(f)) for f in samples),
    )
    stco = full(b"stco", 0, 0, _struct.pack(">II", 1, chunk_off))
    stbl_body = stsd + stts + stsc + stsz + stco
    if keyframes is not None:
        stbl_body += full(
            b"stss", 0, 0,
            _struct.pack(">I", len(keyframes))
            + b"".join(_struct.pack(">I", k) for k in keyframes),
        )
    stbl = box(b"stbl", stbl_body)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ------------------------------------------------------- frame extract
def extract_frames_mp4(
    df: DataFrame,
    max_frames: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """1→N frame explosion with REAL container demux: up to
    ``max_frames`` samples selected uniformly across the track, each
    emitted with its true container timestamp and raw sample payload
    (decodable JPEG bytes for MJPEG tracks). Non-BMFF / table-less
    payloads emit no rows (quarantine-not-crash)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FRAME_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                info = demux_mp4_samples(raw)
                if info is None or not info["samples"]:
                    continue
                samples = info["samples"]
                ts = info["timescale"] or 1
                n = len(samples)
                take = min(max_frames, n)
                # uniform selection across the track, always incl. first
                idxs = sorted({(k * n) // take for k in range(take)})
                for fi, si in enumerate(idxs):
                    off, size, t = samples[si]
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": fi,
                            "ts_s": t / ts,
                            "frame_payload": raw[off : off + size],
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, FRAME_SCHEMA)


def synthesize_mjpeg_corpus(df: DataFrame, id_col: str) -> DataFrame:
    """Distributed synthesis of REAL MJPEG MP4s whose decoded frame
    statistics are pure arithmetic in the row id: video k has
    nf=(k%4)+2 frames at 10 fps, frame i is a single constant 8×8
    JPEG block of value (k%80)+7·i — exact decode (see xops/jpeg.py),
    so a DuckDB oracle recomputes every sampled frame's mean AND
    timestamp without touching a byte."""
    import numpy as np
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from .jpeg import encode_jpeg

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
                nf = (k % 4) + 2
                base = k % 80
                frames = [
                    encode_jpeg(np.full((8, 8), base + 7 * i, dtype=np.uint8))
                    for i in range(nf)
                ]
                out.append(
                    {"media_id": k,
                     "payload": mux_mjpeg_mp4(frames, fps=10, width=8, height=8)}
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return df.mapInPandas(run, schema)
