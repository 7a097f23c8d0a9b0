"""H.264 (AVC) stream PROBING — SPS parse, Annex-B/avcC walk, keyframes.

Full H.264 *decode* is out of scope without media libraries (the
entropy-coded inter-frame pipeline stays a documented stub in
`multimodal.decode_stub`), but the *metadata* a 100 TB video corpus
pipeline needs — codec profile/level, true coded dimensions, keyframe
positions — lives in plain bit-level headers whose layout is published
(ITU-T H.264 §7.3.2.1.1 seq_parameter_set_data; ISO 14496-15 §5.2.4
AVCDecoderConfigurationRecord; ISO 14496-12 §8.6.2 stss sync table):

- ``BitReader``: MSB-first reader with the spec's ``u(n)`` fixed,
  ``ue(v)`` unsigned and ``se(v)`` signed exponential-Golomb reads.
- ``strip_emulation_prevention``: NAL payload → RBSP (the encoder
  inserts 0x03 after any 00 00 to keep start codes unique; §7.4.1).
- ``parse_sps``: profile/level/chroma/bit-depth and the real picture
  size — ``(pic_width_in_mbs_minus1+1)*16`` minus the frame-cropping
  rectangle in chroma-scaled units, interlace-aware
  (``frame_mbs_only_flag``). High-profile scaling lists are walked
  (not skipped) so the following fields stay aligned.
- ``iter_annexb_nals`` / ``parse_avcc``: both packagings of an AVC
  stream — byte-stream with 00 00 (00) 01 start codes, and the MP4
  sample-entry configuration record carrying the SPS/PPS sets.
- ``probe_h264``: one call that accepts either packaging and returns
  the parsed SPS of the first sequence.
- ``build_sps`` / ``build_avcc``: deterministic fixture synthesis
  (same pattern as ``video.mux_mjpeg_mp4``) so tests and corpus
  entries can round-trip build → parse byte-for-byte without vendored
  sample files.

`video.demux_mp4_samples` uses this module to report codec profile +
SPS dimensions for `avc1`/`avc3` tracks and keyframe sample numbers
from `stss`. Scale notes: every parse here touches ≤ a few hundred
bytes per document (the moov tables and the SPS NAL) — it runs inside
the same mapInPandas batches as `probe_media`, nothing leaves the
executor.
"""

from __future__ import annotations

import struct as _struct
from typing import Iterator, Optional

_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139,
                  134, 135}

PROFILE_NAMES = {
    66: "baseline", 77: "main", 88: "extended", 100: "high",
    110: "high10", 122: "high422", 244: "high444", 44: "cavlc444",
}


class BitReader:
    """MSB-first bit reader over bytes (spec notation u(n)/ue(v)/se(v))."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        """Unsigned exp-Golomb: count leading zeros z, read z more bits,
        value = 2^z - 1 + suffix."""
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("exp-Golomb run too long (corrupt SPS)")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        """Signed exp-Golomb: k=ue(); value = (-1)^(k+1) * ceil(k/2)."""
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def strip_emulation_prevention(nal: bytes) -> bytes:
    """NAL payload → RBSP: drop the 0x03 in every 00 00 03 sequence."""
    if b"\x00\x00\x03" not in nal:
        return nal
    out = bytearray()
    i, n = 0, len(nal)
    while i < n:
        if i + 2 < n and nal[i] == 0 and nal[i + 1] == 0 and nal[i + 2] == 3:
            out += b"\x00\x00"
            i += 3
        else:
            out.append(nal[i])
            i += 1
    return bytes(out)


def _scaling_list(br: BitReader, size: int) -> None:
    """Walk (discard) one scaling list — §7.3.2.1.1.1. Must be parsed,
    not skipped: its length is data-dependent."""
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + br.se() + 256) % 256
        last = nxt if nxt != 0 else last


def parse_sps(rbsp: bytes) -> dict:
    """Parse seq_parameter_set_data (§7.3.2.1.1) from RBSP bytes
    (emulation-prevention already stripped; no NAL header byte).

    Returns profile/level/dimensions plus the fields a corpus pipeline
    filters on. Raises ValueError on truncated/corrupt input."""
    br = BitReader(rbsp)
    profile_idc = br.u(8)
    constraint_flags = br.u(8)  # 6 flags + 2 reserved bits
    level_idc = br.u(8)
    sps_id = br.ue()
    chroma_format_idc = 1  # 4:2:0 default for non-high profiles
    separate_colour_plane = 0
    bit_depth_luma = bit_depth_chroma = 8
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = br.ue()
        if chroma_format_idc == 3:
            separate_colour_plane = br.u(1)
        bit_depth_luma = br.ue() + 8
        bit_depth_chroma = br.ue() + 8
        br.u(1)  # qpprime_y_zero_transform_bypass_flag
        if br.u(1):  # seq_scaling_matrix_present_flag
            for i in range(8 if chroma_format_idc != 3 else 12):
                if br.u(1):
                    _scaling_list(br, 16 if i < 6 else 64)
    log2_max_frame_num = br.ue() + 4
    pic_order_cnt_type = br.ue()
    if pic_order_cnt_type == 0:
        br.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif pic_order_cnt_type == 1:
        br.u(1)  # delta_pic_order_always_zero_flag
        br.se()  # offset_for_non_ref_pic
        br.se()  # offset_for_top_to_bottom_field
        for _ in range(br.ue()):
            br.se()  # offset_for_ref_frame[i]
    max_num_ref_frames = br.ue()
    br.u(1)  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = br.ue() + 1
    pic_height_in_map_units = br.ue() + 1
    frame_mbs_only = br.u(1)
    if not frame_mbs_only:
        br.u(1)  # mb_adaptive_frame_field_flag
    br.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if br.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = br.ue(), br.ue(), br.ue(), br.ue()
    # crop units per Table 6-1: ChromaArrayType 0 (monochrome or
    # separate planes) crops in luma samples; 4:2:0 halves both axes,
    # 4:2:2 halves x only, 4:4:4 neither. Vertical units double again
    # for interlaced (field-coded) sequences.
    chroma_array_type = 0 if separate_colour_plane else chroma_format_idc
    sub_w = 2 if chroma_array_type in (1, 2) else 1
    sub_h = 2 if chroma_array_type == 1 else 1
    crop_unit_x = 1 if chroma_array_type == 0 else sub_w
    crop_unit_y = (1 if chroma_array_type == 0 else sub_h) * (2 - frame_mbs_only)
    width = pic_width_in_mbs * 16 - crop_unit_x * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * pic_height_in_map_units * 16 \
        - crop_unit_y * (crop_t + crop_b)
    return {
        "profile_idc": profile_idc,
        "profile": PROFILE_NAMES.get(profile_idc, f"profile_{profile_idc}"),
        "constraint_flags": constraint_flags >> 2,
        "level_idc": level_idc,
        "level": f"{level_idc // 10}.{level_idc % 10}",
        "sps_id": sps_id,
        "chroma_format_idc": chroma_format_idc,
        "bit_depth_luma": bit_depth_luma,
        "bit_depth_chroma": bit_depth_chroma,
        "log2_max_frame_num": log2_max_frame_num,
        "pic_order_cnt_type": pic_order_cnt_type,
        "max_num_ref_frames": max_num_ref_frames,
        "frame_mbs_only": bool(frame_mbs_only),
        "width": width,
        "height": height,
    }


# ------------------------------------------------------- packagings
def iter_annexb_nals(data: bytes) -> Iterator[tuple[int, bytes]]:
    """(nal_unit_type, payload-after-header) for each NAL in an
    Annex-B byte stream (00 00 01 or 00 00 00 01 start codes)."""
    n = len(data)
    i = data.find(b"\x00\x00\x01")
    while i != -1 and i + 3 < n:
        start = i + 3
        nxt = data.find(b"\x00\x00\x01", start)
        end = n if nxt == -1 else (nxt - 1 if nxt > 0 and data[nxt - 1] == 0 else nxt)
        nal = data[start:end]
        if nal:
            yield nal[0] & 0x1F, nal[1:]
        i = nxt
    return


def parse_avcc(rec: bytes) -> Optional[dict]:
    """AVCDecoderConfigurationRecord (ISO 14496-15 §5.2.4.1): the
    `avcC` box body inside an avc1 sample entry. Returns profile/level
    + parsed SPS of the first set, or None if malformed."""
    if len(rec) < 7 or rec[0] != 1:
        return None
    try:
        profile, compat, level = rec[1], rec[2], rec[3]
        nal_length_size = (rec[4] & 0x03) + 1
        n_sps = rec[5] & 0x1F
        i = 6
        sps_list = []
        for _ in range(n_sps):
            (ln,) = _struct.unpack(">H", rec[i:i + 2])
            sps_list.append(rec[i + 2:i + 2 + ln])
            i += 2 + ln
        n_pps = rec[i]
        i += 1
        pps_list = []
        for _ in range(n_pps):
            (ln,) = _struct.unpack(">H", rec[i:i + 2])
            pps_list.append(rec[i + 2:i + 2 + ln])
            i += 2 + ln
        out = {
            "profile_idc": profile, "compat": compat, "level_idc": level,
            "nal_length_size": nal_length_size,
            "n_sps": n_sps, "n_pps": n_pps, "sps": None,
        }
        if sps_list and sps_list[0]:
            # NAL header byte then payload; strip emulation prevention
            out["sps"] = parse_sps(strip_emulation_prevention(sps_list[0][1:]))
        return out
    except (IndexError, ValueError, _struct.error):
        return None


def probe_h264(data: bytes) -> Optional[dict]:
    """Parsed SPS from either packaging: an avcC configuration record
    (starts with version byte 1) or an Annex-B byte stream."""
    if data[:1] == b"\x01":
        rec = parse_avcc(data)
        if rec and rec["sps"]:
            return rec["sps"]
        return None
    for typ, payload in iter_annexb_nals(data):
        if typ == 7:  # SPS NAL
            try:
                return parse_sps(strip_emulation_prevention(payload))
            except (IndexError, ValueError):
                return None
    return None


# ------------------------------------------------- fixture synthesis
class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def ue(self, v: int) -> None:
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def bytes_rbsp(self) -> bytes:
        # rbsp_trailing_bits: stop bit then zero-pad to a byte
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def build_sps(
    width: int,
    height: int,
    profile_idc: int = 66,
    level_idc: int = 31,
    frame_mbs_only: bool = True,
) -> bytes:
    """Serialize a spec-conformant SPS RBSP for the given coded size
    (deterministic fixture synthesis; width/height need not be MB
    multiples — the builder emits the cropping rectangle, which the
    parser must undo). 4:2:0 8-bit; high profiles get the extra
    chroma/bit-depth fields."""
    if width % 2 or height % 2:
        raise ValueError("4:2:0 cropping works in 2-sample units")
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)  # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(0)  # sps_id
    if profile_idc in _HIGH_PROFILES:
        w.ue(1)  # chroma_format_idc 4:2:0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.u(0, 1)  # qpprime bypass
        w.u(0, 1)  # no scaling matrix
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type (2 = no extra fields)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num
    mb_w = (width + 15) // 16
    unit_h = 16 * (2 if not frame_mbs_only else 1)
    map_h = (height + unit_h - 1) // unit_h
    w.ue(mb_w - 1)
    w.ue(map_h - 1)
    w.u(1 if frame_mbs_only else 0, 1)
    if not frame_mbs_only:
        w.u(0, 1)  # mb_adaptive_frame_field_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    crop_x = mb_w * 16 - width
    crop_y = map_h * unit_h - height
    if crop_x or crop_y:
        w.u(1, 1)
        # CropUnitX=2, CropUnitY=2*(2-frame_mbs_only) for 4:2:0
        w.ue(0)
        w.ue(crop_x // 2)
        w.ue(0)
        w.ue(crop_y // (2 * (2 - (1 if frame_mbs_only else 0))))
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    return w.bytes_rbsp()


def build_avcc(sps_rbsp: bytes, profile_idc: int = 66, level_idc: int = 31) -> bytes:
    """AVCDecoderConfigurationRecord wrapping one SPS (NAL header 0x67
    prepended) and one minimal PPS — enough for parse_avcc and for an
    MP4 avc1 sample entry fixture."""
    sps_nal = b"\x67" + sps_rbsp
    pps_nal = b"\x68\xce\x38\x80"  # minimal well-formed PPS NAL
    return (
        bytes([1, profile_idc, 0, level_idc, 0xFF, 0xE1])
        + _struct.pack(">H", len(sps_nal)) + sps_nal
        + b"\x01" + _struct.pack(">H", len(pps_nal)) + pps_nal
    )
