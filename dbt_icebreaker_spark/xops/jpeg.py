"""Pure-numpy baseline JPEG codec (SURVEY §2.6 X4/X6 — closes the
"JPEG stays a stub" gap flagged in round-2 review).

Everything here implements the published ITU-T T.81 spec the same way
``imaging.py`` implements the PNG spec: no PIL, no libjpeg.

- ``decode_jpeg``: baseline sequential DCT (SOF0/SOF1), Huffman
  entropy decode (tables parsed from the file's own DHT segments),
  8/16-bit DQT, restart markers, byte unstuffing, 4:4:4 / 4:2:2 /
  4:2:0 chroma subsampling with nearest-neighbor upsample, JFIF
  YCbCr→RGB. Progressive (SOF2), arithmetic coding and 12-bit
  precision return None — the quarantine-not-crash policy shared with
  ``decode_png``/``probe_bytes``.
- ``encode_jpeg``: 4:4:4 / grayscale encoder used to synthesize REAL
  decodable fixtures distributed-side. With the default all-ones
  quantization table, per-block-constant images round-trip EXACTLY
  (a constant block has an integer DC coefficient and zero AC), which
  is what lets a DuckDB oracle recompute decoded pixel statistics
  arithmetically — same construction as ``synthesize_decodable_pngs``.
  The Huffman tables are canonical single-length codes built from the
  symbols actually emitted and embedded via DHT, so any spec
  decoder — not just this one — can read the output.

Scale notes: the entropy decode is a per-byte Python loop — fine for
the fixture sizes the corpus uses, and parallelism at 100 TB comes
from ``mapInPandas`` fan-out (decode never leaves the executor; only
fixed-width stats shuffle). For production JPEG corpora you would
vendor a vectorized codec; the Spark-side plumbing (schema,
partitioning, batch shape) is identical either way.
"""

from __future__ import annotations

import struct as _struct
from typing import Optional

import numpy as np

# ------------------------------------------------------------- constants
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# orthonormal 8x8 DCT-II basis: forward S = T @ B @ T.T equals the
# T.81 definition S(v,u) = 1/4 C(u) C(v) ΣΣ ... exactly
_T = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
    _T[_u] = _c * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16)


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ------------------------------------------------------------- decoder
class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops (raises _Marker) at a real marker."""

    class _Marker(Exception):
        def __init__(self, marker: int):
            self.marker = marker

    def __init__(self, raw: bytes, pos: int):
        self.raw = raw
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.raw[self.pos]
        if b == 0xFF:
            nxt = self.raw[self.pos + 1] if self.pos + 1 < len(self.raw) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _BitReader._Marker(nxt)
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        return v

    def align(self) -> None:
        self.nbits = 0
        self.bits = 0

    def expect_restart(self) -> int:
        """Byte-aligned RSTn marker; returns n (0-7)."""
        self.align()
        raw, p = self.raw, self.pos
        if p + 1 < len(raw) and raw[p] == 0xFF and 0xD0 <= raw[p + 1] <= 0xD7:
            self.pos = p + 2
            return raw[p + 1] - 0xD0
        raise ValueError("missing restart marker")


def _huff_table(bits: list[int], huffval: list[int]) -> dict:
    """(length, code) → symbol map from DHT's BITS/HUFFVAL arrays
    (canonical code assignment, T.81 Annex C)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_jpeg(raw: bytes) -> Optional[np.ndarray]:
    """Baseline JPEG → H×W×C uint8 (C=1 gray, C=3 RGB), or None for
    non-JPEG / progressive / arithmetic / 12-bit payloads."""
    if len(raw) < 4 or raw[0:2] != b"\xff\xd8":
        return None
    try:
        return _decode(raw)
    except (ValueError, IndexError, KeyError, _struct.error, _BitReader._Marker):
        return None


def _decode(raw: bytes) -> Optional[np.ndarray]:
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    width = height = None
    restart_interval = 0
    i = 2
    n = len(raw)
    while i + 4 <= n:
        if raw[i] != 0xFF:
            return None
        marker = raw[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            return None
        (seglen,) = _struct.unpack(">H", raw[i + 2 : i + 4])
        seg = raw[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17 : p + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_table(bits, vals)
                p += 17 + cnt
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline & ext. sequential
            prec = seg[0]
            if prec != 8:
                return None
            height, width = _struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # progressive / lossless / arithmetic
        elif marker == 0xDD:  # DRI
            (restart_interval,) = _struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tt >> 4, tt & 15)
            data_start = i + 2 + seglen
            return _decode_scan(
                raw, data_start, width, height, comps, scan_tables,
                qt, huff_dc, huff_ac, restart_interval,
            )
        i += 2 + seglen
    return None


def _decode_scan(
    raw, pos, width, height, comps, scan_tables, qt, huff_dc, huff_ac,
    restart_interval,
):
    if width is None or not comps:
        return None
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    br = _BitReader(raw, pos)
    preds = {cid: 0 for cid, *_ in comps}
    planes = {
        cid: np.zeros((mcuy * v * 8, mcux * h * 8), dtype=np.float64)
        for cid, h, v, _ in comps
    }
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                got = br.expect_restart()
                if got != rst_n:
                    raise ValueError("restart marker out of sequence")
                rst_n = (rst_n + 1) % 8
                preds = {cid: 0 for cid, *_ in comps}
            for cid, h, v, tq in comps:
                dc_t, ac_t = scan_tables[cid]
                for by in range(v):
                    for bx in range(h):
                        block = _decode_block(
                            br, huff_dc[dc_t], huff_ac[ac_t], qt[tq], preds, cid
                        )
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # upsample subsampled components to full MCU-grid resolution, crop
    out_planes = []
    for cid, h, v, _ in comps:
        p = planes[cid]
        if h != hmax or v != vmax:
            p = np.kron(p, np.ones((vmax // v, hmax // h)))
        out_planes.append(p[:height, :width])
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return g[:, :, None]
    if len(out_planes) == 3:
        y, cb, cr = out_planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return None


def _decode_block(br, dc_table, ac_table, quant, preds, cid):
    coefs = np.zeros(64, dtype=np.int64)
    s = _huff_decode(br, dc_table)
    diff = _extend(br.read(s), s) if s else 0
    preds[cid] += diff
    coefs[0] = preds[cid]
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_table)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        size = rs & 15
        if k > 63:
            raise ValueError("AC index overflow")
        coefs[k] = _extend(br.read(size), size)
        k += 1
    dq = coefs * quant
    block = np.zeros(64, dtype=np.float64)
    block[_ZIGZAG] = dq
    f = block.reshape(8, 8)
    return _T.T @ f @ _T + 128.0


# ------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec)
        return bytes(self.out)


def _canonical_single_length(symbols: set[int]) -> tuple[list[int], list[int], dict]:
    """All symbols at one code length L with 2**L > n (keeps the
    all-ones code unused, as T.81 requires). Returns (BITS, HUFFVAL,
    sym → (code, L))."""
    syms = sorted(symbols)
    n = len(syms)
    L = max(1, (n + 1 - 1).bit_length())  # ceil(log2(n+1))
    while (1 << L) <= n:
        L += 1
    bits = [0] * 16
    bits[L - 1] = n
    codes = {s: (idx, L) for idx, s in enumerate(syms)}
    return bits, syms, codes


def _block_symbols(zz: np.ndarray, pred: int) -> tuple[int, list, list]:
    """(new_pred, dc_items, ac_items) where items are
    (symbol, extra_bits_value, extra_bits_len)."""
    diff = int(zz[0]) - pred
    s = abs(diff).bit_length()
    dc = [(s, diff if diff >= 0 else diff + (1 << s) - 1, s)]
    ac = []
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ac.append((0xF0, 0, 0))
            run -= 16
        sz = abs(v).bit_length()
        ac.append(((run << 4) | sz, v if v >= 0 else v + (1 << sz) - 1, sz))
        run = 0
    if last_nz < 63:
        ac.append((0x00, 0, 0))  # EOB
    return int(zz[0]), dc, ac


def encode_jpeg(arr: np.ndarray, quant: Optional[np.ndarray] = None) -> bytes:
    """Baseline 4:4:4 / grayscale JPEG encoder. Default quantization
    is all-ones: per-block-constant content round-trips exactly."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h0, w0, c = arr.shape
    if c not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    q = np.ones(64, dtype=np.int64) if quant is None else quant.astype(np.int64)
    # pad to 8x8 blocks by edge replication
    H = -(-h0 // 8) * 8
    W = -(-w0 // 8) * 8
    padded = np.empty((H, W, c), dtype=np.float64)
    padded[:h0, :w0] = arr
    padded[h0:, :w0] = arr[-1:, :, :]
    padded[:, w0:] = padded[:, w0 - 1 : w0]
    if c == 3:
        r, g, b = padded[:, :, 0], padded[:, :, 1], padded[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [np.round(y), np.round(cb), np.round(cr)]
    else:
        planes = [padded[:, :, 0].astype(np.float64)]
    # forward DCT + quant + zigzag for every block of every plane
    all_blocks: list[list[np.ndarray]] = []
    for p in planes:
        blocks = []
        for by in range(H // 8):
            for bx in range(W // 8):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                f = _T @ blk @ _T.T
                # zigzag: stream position k carries flat index _ZIGZAG[k]
                zz = np.round(f).astype(np.int64).reshape(-1)[_ZIGZAG]
                if quant is not None:
                    zz = np.round(zz / q).astype(np.int64)
                blocks.append(zz)
        all_blocks.append(blocks)
    # pass 1: symbol inventory (interleaved MCU order = block order
    # per plane since sampling is 1x1 everywhere)
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    preds = [0] * len(planes)
    nblocks = len(all_blocks[0])
    for bi in range(nblocks):
        for ci in range(len(planes)):
            preds[ci], dc, ac = _block_symbols(all_blocks[ci][bi], preds[ci])
            dc_syms.update(s for s, _, _ in dc)
            ac_syms.update(s for s, _, _ in ac)
    dc_bits, dc_vals, dc_codes = _canonical_single_length(dc_syms)
    ac_bits, ac_vals, ac_codes = _canonical_single_length(ac_syms)
    # pass 2: entropy-coded data
    bw = _BitWriter()
    preds = [0] * len(planes)
    for bi in range(nblocks):
        for ci in range(len(planes)):
            preds[ci], dc, ac = _block_symbols(all_blocks[ci][bi], preds[ci])
            code, clen = dc_codes[dc[0][0]]
            bw.write(code, clen)
            if dc[0][2]:
                bw.write(dc[0][1], dc[0][2])
            for sym, extra, elen in ac:
                code, clen = ac_codes[sym]
                bw.write(code, clen)
                if elen:
                    bw.write(extra, elen)
    data = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    ncomp = len(planes)
    sof = _struct.pack(">BHHB", 8, h0, w0, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += data
    out += b"\xff\xd9"
    return bytes(out)
