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
    """JPEG → H×W×C uint8 (C=1 gray, C=3 RGB). Handles baseline and
    extended sequential (SOF0/SOF1) AND progressive (SOF2: spectral
    selection + successive approximation, per T.81 Annex G). Returns
    None for non-JPEG / arithmetic-coded / lossless / 12-bit
    payloads — the quarantine-not-crash policy."""
    if len(raw) < 4 or raw[0:2] != b"\xff\xd8":
        return None
    try:
        return _decode(raw)
    except (ValueError, IndexError, KeyError, ZeroDivisionError,
            _struct.error, _BitReader._Marker):
        return None


def _geometry(width: int, height: int, comps) -> dict:
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    per = {}
    for cid, h, v, _tq in comps:
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        per[cid] = {
            "bw": -(-cw // 8), "bh": -(-ch // 8),   # true block dims
            "bw_pad": mcux * h, "bh_pad": mcuy * v,  # MCU-padded dims
            "cw": cw, "ch": ch,
        }
    return {"hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy, "per": per}


def _next_marker(raw: bytes, pos: int) -> int:
    """First real marker at/after pos (skips entropy bytes, 0xFF00
    stuffing, fill bytes and RSTn)."""
    i, n = pos, len(raw)
    while i + 1 < n:
        if raw[i] == 0xFF:
            nxt = raw[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            if nxt == 0xFF:  # fill byte
                i += 1
                continue
            return i
        i += 1
    return n


def _decode(raw: bytes) -> Optional[np.ndarray]:
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    width = height = None
    progressive = False
    restart_interval = 0
    geom = None
    coefs: Optional[dict[int, np.ndarray]] = None
    i, n = 2, len(raw)
    while i + 4 <= n:
        if raw[i] != 0xFF:
            return None
        marker = raw[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            if seg[0] != 8:  # precision
                return None
            height, width = _struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / differential
        elif marker == 0xDD:  # DRI
            (restart_interval,) = _struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS
            if width is None or not comps:
                return None
            if geom is None:
                geom = _geometry(width, height, comps)
                coefs = {
                    cid: np.zeros(
                        (geom["per"][cid]["bh_pad"], geom["per"][cid]["bw_pad"], 64),
                        dtype=np.int32,
                    )
                    for cid, *_ in comps
                }
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cid, tt >> 4, tt & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            end = _decode_scan_into(
                raw, i + 2 + seglen, comps, scan_comps, geom, coefs,
                huff_dc, huff_ac, restart_interval, ss, se, ah, al,
            )
            i = _next_marker(raw, end)
            continue
        i += 2 + seglen
    if coefs is None:
        return None
    return _reconstruct(raw, width, height, comps, geom, coefs, qt)


def _decode_scan_into(
    raw, pos, comps, scan_comps, geom, coefs, huff_dc, huff_ac, dri,
    ss, se, ah, al,
):
    """Decode one entropy-coded scan into the coefficient store
    (zigzag order). Returns the byte position where entropy data
    ended. Handles interleaved (ns>1 or full sequential) and
    non-interleaved (single-component) scans, restart intervals, and
    all four progressive scan kinds."""
    br = _BitReader(raw, pos)
    cmap = {cid: (h, v, tq) for cid, h, v, tq in comps}
    preds = {cid: 0 for cid, _dc, _ac in scan_comps}
    state = {"eobrun": 0}
    rst_n = 0

    def unit(blk, dc_t, ac_t, cid):
        if ss == 0 and ah == 0:
            # DC first (progressive) or full block (sequential)
            s = _huff_decode(br, huff_dc[dc_t])
            diff = _extend(br.read(s), s) if s else 0
            preds[cid] += diff
            # Corrupt streams can walk the predictor arbitrarily far;
            # clamp so the int32 coefficient store never overflows
            # (valid DC magnitude is <= 2^15 even at 12-bit precision,
            # and al <= 13, so 2^28 leaves huge margin for real images).
            if preds[cid] > 0x7FFF:
                preds[cid] = 0x7FFF
            elif preds[cid] < -0x8000:
                preds[cid] = -0x8000
            blk[0] = preds[cid] << al
            if se > 0:
                _ac_first(br, blk, huff_ac[ac_t], 1, se, 0, state)
        elif ss == 0:  # DC refinement
            if br.read(1):
                blk[0] |= 1 << al
        elif ah == 0:  # AC first
            _ac_first(br, blk, huff_ac[ac_t], ss, se, al, state)
        else:  # AC refinement
            _ac_refine(br, blk, huff_ac[ac_t], ss, se, al, state)

    def maybe_restart(count):
        nonlocal rst_n
        if dri and count and count % dri == 0:
            got = br.expect_restart()
            if got != rst_n:
                raise ValueError("restart out of sequence")
            rst_n = (rst_n + 1) % 8
            for k in preds:
                preds[k] = 0
            state["eobrun"] = 0

    try:
        if len(scan_comps) == 1 and (ss > 0 or len(comps) > 1):
            # non-interleaved: raster over the component's TRUE blocks
            cid, dc_t, ac_t = scan_comps[0]
            g = geom["per"][cid]
            cnt = 0
            for by in range(g["bh"]):
                for bx in range(g["bw"]):
                    maybe_restart(cnt)
                    unit(coefs[cid][by, bx], dc_t, ac_t, cid)
                    cnt += 1
        else:
            cnt = 0
            for my in range(geom["mcuy"]):
                for mx in range(geom["mcux"]):
                    maybe_restart(cnt)
                    for cid, dc_t, ac_t in scan_comps:
                        h, v, _tq = cmap[cid]
                        for by in range(v):
                            for bx in range(h):
                                unit(
                                    coefs[cid][my * v + by, mx * h + bx],
                                    dc_t, ac_t, cid,
                                )
                    cnt += 1
    except _BitReader._Marker:
        pass  # truncated scan: keep what decoded (best-effort layer)
    return br.pos


def _ac_first(br, blk, ac_table, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(br, ac_table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.read(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overflow")
        blk[k] = _extend(br.read(s), s) << al
        k += 1


def _ac_refine(br, blk, ac_table, ss, se, al, state):
    """T.81 G.1.2.3 successive-approximation AC refinement (the
    correction-bit pass), mirroring the spec's decoder flow."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(br, ac_table)
            r, s = rs >> 4, rs & 15
            s_val = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.read(r)
                    break
                # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid refinement size")
                s_val = p1 if br.read(1) else m1
            while k <= se:
                coef = int(blk[k])
                if coef != 0:
                    if br.read(1) and (coef & p1) == 0:
                        blk[k] = coef + (p1 if coef >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = s_val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            coef = int(blk[k])
            if coef != 0:
                if br.read(1) and (coef & p1) == 0:
                    blk[k] = coef + (p1 if coef >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


def _reconstruct(raw, width, height, comps, geom, coefs, qt):
    """Dequant + vectorized IDCT + plane assembly + upsample + color."""
    out_planes = []
    hmax, vmax = geom["hmax"], geom["vmax"]
    for cid, h, v, tq in comps:
        g = geom["per"][cid]
        zz = coefs[cid].astype(np.float64) * qt[tq]  # dequant (zigzag order)
        blocks = np.zeros_like(zz)
        blocks[:, :, _ZIGZAG] = zz  # de-zigzag to row-major 64
        f = blocks.reshape(g["bh_pad"], g["bw_pad"], 8, 8)
        # IDCT: T.T @ F @ T for every block, one einsum
        px = np.einsum("ij,abjk,kl->abil", _T.T, f, _T) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(g["bh_pad"] * 8, g["bw_pad"] * 8)
        plane = plane[: g["ch"], : g["cw"]]
        if h != hmax or v != vmax:
            plane = np.kron(plane, np.ones((vmax // v, hmax // h)))
        out_planes.append(plane[:height, :width])
    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(out_planes) == 3:
        y, cb, cr = out_planes
        r = y + 1.402 * (cr - 128.0)
        gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, gg, b], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return None


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


# ------------------------------------------------- progressive encoder
def encode_jpeg_progressive(
    arr: np.ndarray, quant: Optional[np.ndarray] = None
) -> bytes:
    """Progressive (SOF2) encoder exercising ALL FOUR scan kinds of
    T.81 Annex G: DC first with successive approximation (Al=1), DC
    refinement (raw bits), per-component AC first (Al=1), and
    per-component AC refinement (the correction-bit pass, G.1.2.3).
    Same 4:4:4/grayscale + all-ones-quant envelope as encode_jpeg, so
    progressive output decodes to EXACTLY the same pixels as the
    baseline encoding of the same array — the differential test that
    pins encoder/decoder asymmetries."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h0, w0, c = arr.shape
    if c not in (1, 3):
        raise ValueError("1 or 3 channels")
    q = np.ones(64, dtype=np.int64) if quant is None else quant.astype(np.int64)
    H, W = -(-h0 // 8) * 8, -(-w0 // 8) * 8
    padded = np.empty((H, W, c), dtype=np.float64)
    padded[:h0, :w0] = arr
    padded[h0:, :w0] = arr[-1:, :, :]
    padded[:, w0:] = padded[:, w0 - 1 : w0]
    if c == 3:
        r, g, b = padded[:, :, 0], padded[:, :, 1], padded[:, :, 2]
        planes = [
            np.round(0.299 * r + 0.587 * g + 0.114 * b),
            np.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b),
            np.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b),
        ]
    else:
        planes = [padded[:, :, 0].astype(np.float64)]
    nbx, nby = W // 8, H // 8
    comp_blocks: list[list[np.ndarray]] = []
    for p in planes:
        blocks = []
        for by in range(nby):
            for bx in range(nbx):
                f = _T @ (p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0) @ _T.T
                zz = np.round(f).astype(np.int64).reshape(-1)[_ZIGZAG]
                if quant is not None:
                    zz = np.round(zz / q).astype(np.int64)
                blocks.append(zz)
        comp_blocks.append(blocks)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    def dht(cls: int, bits, vals) -> bytes:
        return seg(0xC4, bytes([cls << 4]) + bytes(bits) + bytes(vals))

    def sos(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        return seg(0xDA, bytes(body) + bytes([ss, se, (ah << 4) | al]))

    def dc_sym(diff: int):
        s = abs(diff).bit_length()
        return s, (diff if diff >= 0 else diff + (1 << s) - 1, s)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    ncomp = len(planes)
    sof = _struct.pack(">BHHB", 8, h0, w0, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += seg(0xC2, sof)

    nblocks = nbx * nby

    # ---- scan 1: DC first, interleaved, Al=1 ------------------------
    al = 1
    items = []
    preds = [0] * ncomp
    for bi in range(nblocks):
        for ci in range(ncomp):
            v = int(comp_blocks[ci][bi][0]) >> al
            d = v - preds[ci]
            preds[ci] = v
            items.append(dc_sym(d))
    bits_t, vals_t, codes = _canonical_single_length({s for s, _ in items})
    out += dht(0, bits_t, vals_t)
    out += sos(list(range(1, ncomp + 1)), 0, 0, 0, al)
    bw = _BitWriter()
    for s, (extra, elen) in items:
        code, clen = codes[s]
        bw.write(code, clen)
        if elen:
            bw.write(extra, elen)
    out += bw.flush()

    # ---- scan 2: DC refinement (raw bit per block) ------------------
    out += sos(list(range(1, ncomp + 1)), 0, 0, 1, 0)
    bw = _BitWriter()
    for bi in range(nblocks):
        for ci in range(ncomp):
            bw.write(int(comp_blocks[ci][bi][0]) & 1, 1)
    out += bw.flush()

    # ---- per component: AC first (Al=1) then AC refine (Al=0) -------
    for ci in range(ncomp):
        # AC first: codes coef>>1 (toward zero) via baseline RLE syntax
        syms = []  # (symbol, extra, elen) stream per block
        stream: list[tuple] = []
        for bi in range(nblocks):
            zz = comp_blocks[ci][bi]
            run = 0
            emitted = False
            for k in range(1, 64):
                t = int(zz[k])
                v = (abs(t) >> 1) * (1 if t >= 0 else -1)
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    stream.append((0xF0, 0, 0))
                    run -= 16
                s = abs(v).bit_length()
                stream.append(((run << 4) | s, v if v >= 0 else v + (1 << s) - 1, s))
                run = 0
                emitted = True
            if run or not emitted:
                stream.append((0x00, 0, 0))  # EOB (run=1)
        bits_t, vals_t, codes = _canonical_single_length({s for s, _, _ in stream})
        out += dht(1, bits_t, vals_t)
        out += sos([ci + 1], 1, 63, 0, 1)
        bw = _BitWriter()
        for sym, extra, elen in stream:
            code, clen = codes[sym]
            bw.write(code, clen)
            if elen:
                bw.write(extra, elen)
        out += bw.flush()

        # AC refine: newly-nonzero (|t|==1) via (run,1)+sign, history
        # (|t|>1) as pending correction bits flushed after each symbol
        stream2: list[tuple] = []  # ("sym", sym, extra, elen) | ("bit", b)
        for bi in range(nblocks):
            zz = comp_blocks[ci][bi]
            run = 0
            pending: list[int] = []
            for k in range(1, 64):
                t = int(zz[k])
                a = abs(t)
                if a == 0:
                    run += 1
                    continue
                # ZRL must be emitted as soon as ANY nonzero (history
                # or newly-nonzero) follows >15 zero-history positions
                # — flushing here keeps the buffered correction bits
                # inside the decoder's 16-zero walk window (libjpeg
                # jcphuff structure; flushing only at newly-nonzero
                # coefficients desyncs the stream)
                while run > 15:
                    stream2.append(("sym", 0xF0, 0, 0))
                    for pb in pending:
                        stream2.append(("bit", pb))
                    pending = []
                    run -= 16
                if a == 1:  # newly nonzero in this scan
                    stream2.append(("sym", (run << 4) | 1, 1 if t > 0 else 0, 1))
                    for pb in pending:
                        stream2.append(("bit", pb))
                    pending = []
                    run = 0
                else:  # history coefficient: correction bit
                    pending.append(a & 1)
            # EOB (eobrun=1) + remaining correction bits — but ONLY if
            # positions remain after the last newly-nonzero: when it
            # sat exactly at k=63 the decoder's k>Se loop exit already
            # ends the block, and an extra EOB here desyncs the next
            # block (caught by the hypothesis bit-identity property)
            if run > 0 or pending:
                stream2.append(("sym", 0x00, 0, 0))
                for pb in pending:
                    stream2.append(("bit", pb))
        bits_t, vals_t, codes = _canonical_single_length(
            {s for kind, s, *_ in stream2 if kind == "sym"}
        )
        out += dht(1, bits_t, vals_t)
        out += sos([ci + 1], 1, 63, 1, 0)
        bw = _BitWriter()
        for item in stream2:
            if item[0] == "sym":
                _, sym, extra, elen = item
                code, clen = codes[sym]
                bw.write(code, clen)
                if elen:
                    bw.write(extra, elen)
            else:
                bw.write(item[1], 1)
        out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)
