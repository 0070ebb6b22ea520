"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 baseline
sequential DCT, 8-bit).  No image library needed — same spirit as the
stdlib PNG codec in ``multimodal.py`` and the codec-free PDF leg.

Scope (the honest boundary, explicit):

* ``decode_jpeg``: baseline sequential (SOF0/SOF1) single-scan
  interleaved JPEG — marker walk, DQT/DHT parsing (arbitrary canonical
  huffman tables, not just Annex K), byte-stuffing + RSTn restart
  markers, per-component sampling factors (4:4:4, 4:2:0, 4:2:2, ...)
  with replicate upsampling, dequantize + exact float64 2-D IDCT,
  half-up rounding, YCbCr→RGB — AND progressive (SOF2): multi-scan
  coefficient accumulation with spectral selection + successive
  approximation (DC first/refine, AC first/refine with EOBRUN, T.81
  §G.2), interleaved DC scans and non-interleaved per-component scans
  on the component's true block grid — AND arithmetic entropy coding
  (SOF9 extended sequential + SOF10 progressive, T.81 Annex D state
  machine via ``jpeg_arith.py``, DAC conditioning, restart resync) —
  AND 12-bit sample precision on the extended/progressive frames
  (16-bit DQT, level shift 2048, uint16 output).  Hierarchical and
  lossless streams return ``None`` (the caller's NULL/raise boundary,
  like non-8-bit PNG).
* ``encode_jpeg``: baseline sequential 4:4:4/4:2:0 (or grayscale)
  writer with Annex-K quantization tables scaled by the libjpeg quality
  formula and simple fixed-length canonical huffman tables (written
  into DHT, so any conformant decoder reads them) — correctness over
  compression.  ``progressive=True`` emits a spectral-selection +
  successive-approximation scan script (DC Al=1 → DC refine → per-band
  AC Al=1 → AC refine, T.81 §G.1) — because progressive merely reorders
  the same quantized coefficients, its decode must equal the baseline
  decode of the same image BIT-EXACTLY, which is the test invariant.

Rounding is pinned so constant-color images decode to a closed form
(see ``constant_gray_decoded_level``): quantization rounds half away
from zero; IDCT output and color conversion round half UP
(``floor(x+0.5)``) — never Python/numpy banker's rounding, which the
cross-engine twins cannot express.

Reference parity note: the reference engine (duzun/hQuery.php) has no
image codec at all — this module is part of the beyond-reference
multimodal surface (SURVEY.md §2, multimodal rows); its role mirrors
hQuery's fault-tolerance doctrine (src/hQuery/HTML_Index.php:768-803:
convert what you can, record what you cannot, never abort).
"""

from __future__ import annotations

import struct as _struct
from typing import Optional

import numpy as np

from . import jpeg_arith as _ja

__all__ = [
    "encode_jpeg",
    "decode_jpeg",
    "jpeg_dims",
    "jpeg_exif_orientation",
    "quant_tables",
    "constant_gray_decoded_level",
]

# ------------------------------------------------------------------ #
# Tables

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K Table K.1 / K.2 base quantization tables (natural order).
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def quant_tables(quality: int) -> tuple:
    """(luma, chroma) int64[64] natural-order tables at libjpeg-style
    ``quality`` 1..100: scale = 5000/q (q<50) else 200-2q;
    cell = clamp((base*scale+50)//100, 1, 255)."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def s(tbl):
        out = (tbl * scale + 50) // 100
        return np.clip(out, 1, 255).astype(np.int64)
    return s(_QT_LUMA), s(_QT_CHROMA)


# Orthonormal 8-point DCT basis: A[u, x] = c(u) cos((2x+1)uπ/16),
# c(0)=sqrt(1/8), else 1/2.  Forward F = A f Aᵀ equals T.81 §A.3.3's
# (1/4)C(u)C(v)ΣΣ definition; inverse f = Aᵀ F A.
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8.0) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    # blocks: (n, 8, 8) float64 (level-shifted) → (n, 8, 8) coefficients
    return np.einsum("ux,nxy,vy->nuv", _A, blocks, _A)


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    # f[x,y] = Σ_{u,v} A[u,x] F[u,v] A[v,y]  (= Aᵀ F A)
    return np.einsum("ux,nuv,vy->nxy", _A, coef, _A)


def _half_up(x: np.ndarray) -> np.ndarray:
    # floor(x + 0.5): round half UP — engine-neutral (Spark/DuckDB round
    # half away from zero only for non-negatives; banker's is right out).
    # The 1e-6 snap first: float DCT basis products carry ~1e-13 drift,
    # so a mathematically-exact .5 boundary (DC-only blocks where
    # dequantized DC ≡ 4 mod 8) must not tip on noise — the closed-form
    # oracle (constant_gray_decoded_level) depends on exact boundaries.
    return np.floor(np.round(x, 6) + 0.5)


# ------------------------------------------------------------------ #
# Canonical huffman helpers (shared by encode + decode)

def _canonical_codes(bits: list, vals: list) -> dict:
    """T.81 Annex C code assignment: {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical huffman decode table: mincode/maxcode per length
    (T.81 Annex F.2.2.3 DECODE procedure, table-driven)."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, bits: list, vals: list):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = br.read_bit()
        ln = 1
        while code > self.maxcode[ln]:
            ln += 1
            if ln > 16:
                raise ValueError("bad huffman code")
            code = (code << 1) | br.read_bit()
        return self.vals[self.valptr[ln] + code - self.mincode[ln]]


class _BitReader:
    """Entropy-coded segment reader: 0xFF00 byte unstuffing; a bare
    marker (0xFF D0-D7 restart or anything else) ends the segment — the
    caller handles restarts."""

    __slots__ = ("data", "pos", "bitbuf", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("eof in entropy data")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # marker reached mid-read: T.81 pads with 1-bits
                    self.bitbuf = 0xFF
                    self.nbits = 8
                    return self.read_bit()
            else:
                self.pos += 1
            if self.nbits == 0:
                self.bitbuf = b
                self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> Optional[int]:
        """Drop partial byte, consume an RSTn marker; return its index
        0-7 or None if the next marker is not a restart."""
        self.nbits = 0
        p = self.pos
        while p + 1 < len(self.data) and self.data[p] == 0xFF and self.data[p + 1] == 0xFF:
            p += 1  # fill bytes
        if p + 1 < len(self.data) and self.data[p] == 0xFF:
            m = self.data[p + 1]
            if 0xD0 <= m <= 0xD7:
                self.pos = p + 2
                return m - 0xD0
        return None


def _extend(v: int, s: int) -> int:
    # T.81 F.2.2.1 EXTEND: magnitude-category bits → signed value
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ------------------------------------------------------------------ #
# Encoder

def _rgb_to_ycbcr(px: np.ndarray, level: float = 128.0, maxv: int = 255) -> np.ndarray:
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = level - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = level + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(
        np.stack([_half_up(y), _half_up(cb), _half_up(cr)], axis=-1), 0, maxv
    )


def _enc_huff_tables(precision: int = 8):
    """Fixed-length canonical tables, self-described in DHT: 12 DC
    categories at 4 bits; all 162 sequential AC symbols PLUS the 14
    progressive EOBn symbols (r<<4 for r=1..14) at 8 bits (176 codes —
    valid: <2^8, all-ones never assigned).  Compression is poor but the
    bitstream is fully conformant — correctness over ratio.  12-bit
    precision widens the category budget (DC ≤ 15, AC size ≤ 14,
    F.1.2.1/F.1.2.2), so codes move to 5/9 bits."""
    if precision == 12:
        dc_bits = [0, 0, 0, 0, 16] + [0] * 11
        dc_vals = list(range(16))
        ac_vals = (
            [0x00, 0xF0]
            + [(r << 4) for r in range(1, 15)]
            + [(r << 4) | s for r in range(16) for s in range(1, 15)]
        )
        ac_bits = [0] * 8 + [len(ac_vals)] + [0] * 7
        return dc_bits, dc_vals, ac_bits, ac_vals
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_vals = (
        [0x00, 0xF0]
        + [(r << 4) for r in range(1, 15)]  # EOB2..EOB16384 (progressive)
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
    ac_bits = [0] * 7 + [len(ac_vals)] + [0] * 8
    return dc_bits, dc_vals, ac_bits, ac_vals


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    __slots__ = ("out", "buf", "n")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.buf >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad to the byte boundary with 1s


def _encode_block(bw, zz, pred, ci, dc_codes, ac_codes):
    dc = int(zz[0])
    diff = dc - pred[ci]
    pred[ci] = dc
    s = _category(diff)
    code, ln = dc_codes[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]
        bw.put(code, ln)


def _quantize_plane(plane, qt, hb, wb, level: float = 128.0, clamp: int = 1023):
    """Pad to (hb, wb) blocks (edge-replicate), DCT, quantize →
    (hb*wb, 64) int64 in raster block order."""
    h, w = plane.shape
    p = np.pad(plane, ((0, hb * 8 - h), (0, wb * 8 - w)), mode="edge") - level
    blocks = p.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coef = _fdct_blocks(blocks)
    q = qt.reshape(8, 8).astype(np.float64)
    # round half away from zero (T.81 recommendation); clamp to the
    # category budget (8-bit: DC diff ≤ cat 11, AC ≤ cat 10; 12-bit:
    # clamp 16383 keeps AC ≤ cat 14 and DC diffs ≤ cat 15).
    # Same 1e-6 snap as _half_up: exact .5 quantization boundaries
    # (reachable for even table cells) must not tip on DCT drift.
    qc = np.sign(coef) * np.floor(np.round(np.abs(coef) / q, 6) + 0.5)
    return np.clip(qc, -clamp, clamp).astype(np.int64).reshape(-1, 64)


# ---- progressive scan emitters (T.81 §G.1; jc*phuff conventions) ----


def _emit_ac_first_scan(bw, blocks, ss, se, al, ac_codes):
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            r2 = eobrun.bit_length() - 1
            code, ln = ac_codes[r2 << 4]
            bw.put(code, ln)
            if r2:
                bw.put(eobrun - (1 << r2), r2)
            eobrun = 0

    for blk in blocks:
        zzb = blk[_ZIGZAG]
        vals = []
        for k in range(ss, se + 1):
            v = int(zzb[k])
            a = abs(v) >> al
            vals.append(a if v >= 0 else -a)
        if not any(vals):
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        r = 0
        for t in vals:
            if t == 0:
                r += 1
                continue
            while r > 15:
                code, ln = ac_codes[0xF0]
                bw.put(code, ln)
                r -= 16
            s = _category(t)
            code, ln = ac_codes[(r << 4) | s]
            bw.put(code, ln)
            bw.put(t if t >= 0 else t + (1 << s) - 1, s)
            r = 0
        if r > 0:
            eobrun += 1  # trailing zeros fold into the next EOB run
    flush()


def _emit_ac_refine_scan(bw, blocks, ss, se, al, ac_codes):
    eobrun = 0
    run_bits = []  # correction bits carried by the pending EOB run

    def flush():
        nonlocal eobrun, run_bits
        if eobrun:
            r2 = eobrun.bit_length() - 1
            code, ln = ac_codes[r2 << 4]
            bw.put(code, ln)
            if r2:
                bw.put(eobrun - (1 << r2), r2)
            for b in run_bits:
                bw.put(b, 1)
            run_bits = []
            eobrun = 0

    for blk in blocks:
        zzb = blk[_ZIGZAG]
        absv = []
        signs = []
        for k in range(ss, se + 1):
            v = int(zzb[k])
            absv.append(abs(v) >> al)
            signs.append(v > 0)
        eobidx = -1
        for i, a in enumerate(absv):
            if a == 1:
                eobidx = i
        r = 0
        blk_bits = []  # correction bits since the last emitted symbol
        for i, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= eobidx:
                flush()
                code, ln = ac_codes[0xF0]
                bw.put(code, ln)
                for b in blk_bits:
                    bw.put(b, 1)
                blk_bits = []
                r -= 16
            if a > 1:  # history coefficient: one correction bit
                blk_bits.append(a & 1)
                continue
            flush()  # a newly-significant coefficient ends any EOB run
            code, ln = ac_codes[(r << 4) | 1]
            bw.put(code, ln)
            bw.put(1 if signs[i] else 0, 1)
            for b in blk_bits:
                bw.put(b, 1)
            blk_bits = []
            r = 0
        if r > 0 or blk_bits:
            eobrun += 1
            run_bits.extend(blk_bits)
            if eobrun == 0x7FFF:
                flush()
    flush()


def _encode_progressive(out, seg, qblocks, ncomp, h, w, dc_codes, ac_codes):
    """Scan script: DC first (Al=1, interleaved) → DC refine → per
    component AC first in two spectral bands (Al=1) → per component AC
    refine per band (Ah=1→Al=0).  Exercises every progressive decode
    path incl. EOBRUN; total information = baseline, so decode must be
    bit-identical to the sequential encoding's decode."""
    nblocks = qblocks[0].shape[0]

    def sos(comp_ids, ss, se, ah, al):
        b = bytearray([len(comp_ids)])
        for ci in comp_ids:
            t = 0 if ci == 0 else 1
            b += bytes([ci + 1, (t << 4) | t])
        b += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, bytes(b))

    # DC first, Al=1, all components interleaved
    out += sos(list(range(ncomp)), 0, 0, 0, 1)
    bw = _BitWriter()
    pred = [0] * ncomp
    for u in range(nblocks):
        for ci in range(ncomp):
            dcpt = int(qblocks[ci][u][0]) >> 1
            diff = dcpt - pred[ci]
            pred[ci] = dcpt
            s = _category(diff)
            code, ln = dc_codes[s]
            bw.put(code, ln)
            if s:
                bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    bw.flush()
    out += bw.out
    # DC refine, Al=0: one raw bit per block
    out += sos(list(range(ncomp)), 0, 0, 1, 0)
    bw = _BitWriter()
    for u in range(nblocks):
        for ci in range(ncomp):
            bw.put(int(qblocks[ci][u][0]) & 1, 1)
    bw.flush()
    out += bw.out
    # AC: two spectral bands, first pass Al=1 then refine Al=0
    bands = [(1, 5), (6, 63)]
    for ci in range(ncomp):
        for ss, se in bands:
            out += sos([ci], ss, se, 0, 1)
            bw = _BitWriter()
            _emit_ac_first_scan(bw, qblocks[ci], ss, se, 1, ac_codes)
            bw.flush()
            out += bw.out
    for ci in range(ncomp):
        for ss, se in bands:
            out += sos([ci], ss, se, 1, 0)
            bw = _BitWriter()
            _emit_ac_refine_scan(bw, qblocks[ci], ss, se, 0, ac_codes)
            bw.flush()
            out += bw.out


def _encode_seq_arith(qblocks, samp, bwidths, mcux, mcuy, dri) -> bytes:
    """Sequential arithmetic entropy stage (T.81 §F.1.4) over the same
    quantized block grids the huffman path uses; DC table = 0 for the
    luma component, 1 otherwise (mirroring the DHT assignment)."""
    ncomp = len(qblocks)
    out = bytearray()
    enc = _ja.ArithEncoder()
    dc_stats = {t: _ja.new_dc_stats() for t in {0 if c == 0 else 1 for c in range(ncomp)}}
    ac_stats = {t: _ja.new_ac_stats() for t in dc_stats}
    ctx = [0] * ncomp
    pred = [0] * ncomp
    mcu_count = 0
    rst = 0
    L, U = _ja.DEFAULT_DC_COND
    kx = _ja.DEFAULT_AC_COND
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                enc = _ja.ArithEncoder()
                for s in dc_stats.values():
                    s[:] = bytes(len(s))
                for s in ac_stats.values():
                    s[:] = bytes(len(s))
                ctx = [0] * ncomp
                pred = [0] * ncomp
            for ci in range(ncomp):
                t = 0 if ci == 0 else 1
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        row = my * sv + by
                        col = mx * sh + bx
                        zz = qblocks[ci][row * bwidths[ci] + col][_ZIGZAG]
                        dc = int(zz[0])
                        _ja.encode_dc_diff(
                            enc, dc_stats[t], ctx, ci, dc - pred[ci], L, U
                        )
                        pred[ci] = dc
                        _ja.encode_ac_coefs(enc, ac_stats[t], zz, kx)
            mcu_count += 1
    out += enc.flush()
    return bytes(out)


def _encode_progressive_arith(out, seg, qblocks, ncomp):
    """Arithmetic twin of ``_encode_progressive`` — identical scan
    script (DC first Al=1 → DC refine → per-band AC first Al=1 → AC
    refine), so decode must equal the sequential decode bit-exactly."""
    nblocks = qblocks[0].shape[0]
    L, U = _ja.DEFAULT_DC_COND
    kx = _ja.DEFAULT_AC_COND

    def sos(comp_ids, ss, se, ah, al):
        b = bytearray([len(comp_ids)])
        for ci in comp_ids:
            t = 0 if ci == 0 else 1
            b += bytes([ci + 1, (t << 4) | t])
        b += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, bytes(b))

    # DC first, Al=1, interleaved: diffs coded in the shifted domain
    out += sos(list(range(ncomp)), 0, 0, 0, 1)
    enc = _ja.ArithEncoder()
    dc_stats = {t: _ja.new_dc_stats() for t in {0 if c == 0 else 1 for c in range(ncomp)}}
    ctx = [0] * ncomp
    pred = [0] * ncomp
    for u in range(nblocks):
        for ci in range(ncomp):
            t = 0 if ci == 0 else 1
            dcpt = int(qblocks[ci][u][0]) >> 1
            _ja.encode_dc_diff(enc, dc_stats[t], ctx, ci, dcpt - pred[ci], L, U)
            pred[ci] = dcpt
    out += enc.flush()
    # DC refine, Al=0: one fixed bit per block
    out += sos(list(range(ncomp)), 0, 0, 1, 0)
    enc = _ja.ArithEncoder()
    for u in range(nblocks):
        for ci in range(ncomp):
            _ja.encode_dc_refine(enc, int(qblocks[ci][u][0]), 0)
    out += enc.flush()
    # AC: two spectral bands, first pass Al=1 then refine Ah=1 -> Al=0
    bands = [(1, 5), (6, 63)]
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        for ss, se in bands:
            out += sos([ci], ss, se, 0, 1)
            enc = _ja.ArithEncoder()
            ac_stats = _ja.new_ac_stats()
            for blk in qblocks[ci]:
                _ja.encode_ac_coefs(enc, ac_stats, blk[_ZIGZAG], kx, ss, se, 1)
            out += enc.flush()
    for ci in range(ncomp):
        for ss, se in bands:
            out += sos([ci], ss, se, 1, 0)
            enc = _ja.ArithEncoder()
            ac_stats = _ja.new_ac_stats()
            for blk in qblocks[ci]:
                _ja.encode_ac_refine(enc, ac_stats, blk[_ZIGZAG], ss, se, 1, 0)
            out += enc.flush()


def encode_jpeg(
    pixels,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
    arithmetic: bool = False,
    precision: int = 8,
) -> bytes:
    """(h, w[, 3]) uint8 array → baseline JFIF bytes; grayscale for 2-D
    input.  ``subsampling``: '444' (one block per component per MCU) or
    '420' (2×2 luma blocks + one chroma block per MCU; chroma planes
    2×2-mean-downsampled with half-up rounding).  ``restart_interval``
    > 0 writes DRI and emits RSTn every that-many MCUs (exercises the
    decoder's restart resync).  Edge-replicated to full blocks/MCUs.
    ``progressive=True`` writes SOF2 with the scan script of
    ``_encode_progressive`` (4:4:4/grayscale, no restarts).
    ``arithmetic=True`` swaps the entropy stage for T.81 Annex D
    arithmetic coding (SOF9, or SOF10 with ``progressive``), writing a
    DAC segment with the default conditioning.  ``precision=12`` takes
    uint16 samples in 0..4095 and writes an extended (SOF1/2/9/10)
    frame — level shift 2048, widened category budget."""
    if precision == 12:
        arr = np.asarray(pixels, dtype=np.uint16)
        if arr.size and int(arr.max()) > 4095:
            raise ValueError("12-bit samples must be in 0..4095")
    elif precision == 8:
        arr = np.asarray(pixels, dtype=np.uint8)
    else:
        raise ValueError(f"unsupported precision {precision}")
    level = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    clamp = 1023 if precision == 8 else 16383
    gray = arr.ndim == 2
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if progressive and (subsampling == "420" or restart_interval):
        raise ValueError("progressive writer supports 4:4:4, no restarts")
    sub = subsampling == "420" and not gray
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l, qt_c = quant_tables(quality)
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(arr, level, maxv)
        planes = [ycc[:, :, i] for i in range(3)]
        if sub:
            for ci in (1, 2):
                p = planes[ci]
                ph = (p.shape[0] + 1) // 2 * 2
                pw = (p.shape[1] + 1) // 2 * 2
                p = np.pad(
                    p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
                )
                planes[ci] = _half_up(
                    p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                )

    dc_bits, dc_vals, ac_bits, ac_vals = _enc_huff_tables(precision)
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    # MCU grid: 16×16 px for 4:2:0, 8×8 otherwise
    mcu_px = 16 if sub else 8
    mcux = (w + mcu_px - 1) // mcu_px
    mcuy = (h + mcu_px - 1) // mcu_px
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * len(planes)
    qts = [qt_l] + [qt_c] * (len(planes) - 1)
    qblocks = []
    bwidths = []
    for ci, plane in enumerate(planes):
        hb = mcuy * samp[ci][1]
        wb = mcux * samp[ci][0]
        qblocks.append(_quantize_plane(plane, qts[ci], hb, wb, level, clamp))
        bwidths.append(wb)

    bw = _BitWriter()
    if not progressive and not arithmetic:
        pred = [0] * len(planes)
        mcu_count = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    bw.flush()
                    bw.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    pred = [0] * len(planes)
                for ci in range(len(planes)):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            row = my * sv + by
                            col = mx * sh + bx
                            zz = qblocks[ci][row * bwidths[ci] + col][_ZIGZAG]
                            _encode_block(bw, zz, pred, ci, dc_codes, ac_codes)
                mcu_count += 1
        bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + _struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qt_l[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qt_c[_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytearray(_struct.pack(">BHHB", precision, h, w, ncomp))
    for ci in range(ncomp):
        hv = (samp[ci][0] << 4) | samp[ci][1]
        sof += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    if arithmetic:
        sofm = 0xCA if progressive else 0xC9
    elif progressive:
        sofm = 0xC2
    else:
        # true baseline (SOF0) is 8-bit only; 12-bit goes extended
        sofm = 0xC0 if precision == 8 else 0xC1
    out += seg(sofm, bytes(sof))
    if restart_interval:
        out += seg(0xDD, _struct.pack(">H", restart_interval))
    if arithmetic:
        # DAC: default conditioning for every table in use (L=0 U=1;
        # Kx=5) — stated explicitly so any decoder agrees.
        L, U = _ja.DEFAULT_DC_COND
        dac = bytearray([0x00, (U << 4) | L, 0x10, _ja.DEFAULT_AC_COND])
        if not gray:
            dac += bytes([0x01, (U << 4) | L, 0x11, _ja.DEFAULT_AC_COND])
        out += seg(0xCC, bytes(dac))
    else:
        out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        if not gray:
            out += seg(0xC4, bytes([0x01]) + bytes(dc_bits) + bytes(dc_vals))
            out += seg(0xC4, bytes([0x11]) + bytes(ac_bits) + bytes(ac_vals))
    if progressive:
        if arithmetic:
            _encode_progressive_arith(out, seg, qblocks, ncomp)
        else:
            _encode_progressive(out, seg, qblocks, ncomp, h, w, dc_codes, ac_codes)
        out += b"\xff\xd9"
        return bytes(out)
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    if arithmetic:
        out += _encode_seq_arith(
            qblocks, samp, bwidths, mcux, mcuy, restart_interval
        )
    else:
        out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ #
# Decoder

def jpeg_dims(payload: bytes) -> Optional[tuple]:
    """(width, height) from the first SOFn marker — header-only parse
    (any SOF flavor, including progressive)."""
    if not payload or not payload.startswith(b"\xff\xd8"):
        return None
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None
        m = payload[pos + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if m == 0xD9:
            return None
        (ln,) = _struct.unpack(">H", payload[pos + 2 : pos + 4])
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > n:
                return None
            h, w = _struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return int(w), int(h)
        pos += 2 + ln
    return None


def decode_jpeg(payload: Optional[bytes]):
    """Baseline sequential decode.  Returns (w, h, ch, pixels) with
    pixels (h, w, ch) uint8 (ch = 1 gray or 3 RGB), or None for
    anything out of scope (hierarchical, 12-bit, corrupt)."""
    try:
        return _decode_jpeg_impl(payload)
    except (ValueError, IndexError, _struct.error, KeyError):
        return None


def _frame_grid(frame):
    """Shared grid geometry: (hmax, vmax, mcux, mcuy) plus, per
    component, the MCU-padded store width/height and the TRUE block
    dims used by non-interleaved (single-component) scans."""
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
        raise ValueError("bad sampling")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in frame["comps"]:
        c["bw"] = mcux * c["h"]          # padded store grid
        c["bh"] = mcuy * c["v"]
        cw = (w * c["h"] + hmax - 1) // hmax   # true sample dims
        chh = (h * c["v"] + vmax - 1) // vmax
        c["tbw"] = (cw + 7) // 8               # true block dims
        c["tbh"] = (chh + 7) // 8
    return hmax, vmax, mcux, mcuy


def _decode_jpeg_impl(payload: Optional[bytes]):
    if not payload or not payload.startswith(b"\xff\xd8"):
        return None
    n = len(payload)
    pos = 2
    qt = {}
    huff_dc = {}
    huff_ac = {}
    dac_dc = {}  # DAC conditioning: table id -> (L, U)
    dac_ac = {}  # DAC conditioning: table id -> Kx
    restart_interval = 0
    frame = None
    stores = None  # progressive: persistent per-component coefficients
    preds = None
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            return None
        m = payload[pos + 1]
        pos += 2
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:  # EOI
            if frame is not None and frame["prog"] and stores is not None:
                return _assemble_image(frame, stores, qt)
            return None
        (ln,) = _struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + ln]
        if m == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq not in (0, 1):
                    return None
                tbl = np.zeros(64, dtype=np.int64)
                if pq:  # 16-bit entries (12-bit sample data, B.2.4.1)
                    tbl[_ZIGZAG] = np.frombuffer(
                        body[i : i + 128], ">u2"
                    ).astype(np.int64)
                    i += 128
                else:
                    tbl[_ZIGZAG] = np.frombuffer(body[i : i + 64], np.uint8)
                    i += 64
                qt[tq] = tbl
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(body[i + 17 : i + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                i += 17 + cnt
        elif m == 0xDD:  # DRI
            (restart_interval,) = _struct.unpack(">H", body[:2])
        elif m == 0xCC:  # DAC — arithmetic conditioning (T.81 B.2.4.3)
            i = 0
            while i + 1 < len(body):
                tc, tb = body[i] >> 4, body[i] & 0x0F
                cs = body[i + 1]
                if tc == 0:
                    dac_dc[tb] = (cs & 0x0F, cs >> 4)  # (L, U)
                else:
                    dac_ac[tb] = cs  # Kx
                i += 2
        elif m in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0/1 baseline, SOF2 progressive, SOF9/10 arithmetic
            prec = body[0]
            # 12-bit sample data is legal for the extended/progressive
            # frames (SOF1/2/9/10); true-baseline SOF0 is 8-bit only.
            if prec != 8 and not (prec == 12 and m != 0xC0):
                return None
            h, w = _struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid = body[6 + 3 * ci]
                hv = body[7 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": body[8 + 3 * ci]}
                )
            frame = {
                "w": int(w),
                "h": int(h),
                "comps": comps,
                "prog": m in (0xC2, 0xCA),
                "arith": m in (0xC9, 0xCA),
                "prec": int(prec),
            }
            _frame_grid(frame)
            if frame["prog"]:
                stores = {
                    c["id"]: np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
                    for c in comps
                }
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # hierarchical / lossless
        elif m == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            scan = []
            for si in range(ns):
                cs = body[1 + 2 * si]
                td_ta = body[2 + 2 * si]
                comp = next((c for c in frame["comps"] if c["id"] == cs), None)
                if comp is None:
                    return None
                scan.append((comp, td_ta >> 4, td_ta & 0x0F))
            if not frame["prog"]:
                if len(scan) != len(frame["comps"]):
                    return None  # multi-scan sequential out of scope
                if frame.get("arith"):
                    return _decode_scan_arith(
                        payload, pos + ln, frame, scan, qt,
                        dac_dc, dac_ac, restart_interval,
                    )
                return _decode_scan(
                    payload, pos + ln, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            if frame.get("arith"):
                pos = _decode_prog_scan_arith(
                    payload, pos + ln, frame, scan, stores,
                    dac_dc, dac_ac, restart_interval,
                    ss, se, ahal >> 4, ahal & 0x0F,
                )
            else:
                pos = _decode_prog_scan(
                    payload, pos + ln, frame, scan, stores,
                    huff_dc, huff_ac, restart_interval,
                    ss, se, ahal >> 4, ahal & 0x0F,
                )
            continue
        pos += ln
    return None


def _decode_scan(payload, data_pos, frame, scan, qt, huff_dc, huff_ac, dri):
    hmax, vmax, mcux, mcuy = (
        max(c["h"] for c in frame["comps"]),
        max(c["v"] for c in frame["comps"]),
        frame["comps"][0]["bw"] // frame["comps"][0]["h"],
        frame["comps"][0]["bh"] // frame["comps"][0]["v"],
    )
    # per component: coefficient store (n_blocks, 64) in MCU block order
    store = []
    for comp, _td, _ta in scan:
        store.append(np.zeros((comp["bh"] * comp["bw"], 64), dtype=np.int64))
    br = _BitReader(payload, data_pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                if br.align_to_marker() is None:
                    raise ValueError("missing restart marker")
                pred = [0] * len(scan)
            for si, (comp, td, ta) in enumerate(scan):
                dct = huff_dc[td]
                act = huff_ac[ta]
                bw_c = comp["bw"]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        blk = store[si][row * bw_c + col]
                        s = dct.decode(br)
                        if s > 15:  # corrupt table: DC category ≤ 15
                            raise ValueError("bad DC category")
                        diff = _extend(br.receive(s), s) if s else 0
                        pred[si] += diff
                        blk[0] = pred[si]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC overflow")
                            blk[_ZIGZAG[k]] = _extend(br.receive(s), s)
                            k += 1
            mcu_count += 1
    stores = {comp["id"]: store[si] for si, (comp, _t, _a) in enumerate(scan)}
    return _assemble_image(frame, stores, qt)


def _assemble_image(frame, stores, qt):
    """Dequantize + IDCT + upsample + color-convert the per-component
    coefficient stores (MCU-padded grids) into the final pixel array.
    12-bit frames produce uint16 samples in 0..4095 (level shift 2048,
    T.81 §A.3.1); 8-bit frames keep the uint8 contract."""
    w, h = frame["w"], frame["h"]
    prec = frame.get("prec", 8)
    level = 1 << (prec - 1)
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    planes = []
    for comp in frame["comps"]:
        q = qt[comp["tq"]].reshape(1, 8, 8).astype(np.float64)
        coef = stores[comp["id"]].reshape(-1, 8, 8).astype(np.float64) * q
        spatial = _idct_blocks(coef)
        px = np.clip(_half_up(spatial) + level, 0, maxv).astype(dtype)
        bw_c, bh_c = comp["bw"], comp["bh"]
        plane = (
            px.reshape(bh_c, bw_c, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh_c * 8, bw_c * 8)
        )
        # replicate-upsample to full MCU grid resolution
        if vmax % comp["v"] or hmax % comp["h"]:
            raise ValueError("non-integer sampling ratio")
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return w, h, 1, planes[0][:, :, None]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - float(level)
    cr = planes[2].astype(np.float64) - float(level)
    r = np.clip(_half_up(y + 1.402 * cr), 0, maxv)
    g = np.clip(_half_up(y - 0.344136 * cb - 0.714136 * cr), 0, maxv)
    b = np.clip(_half_up(y + 1.772 * cb), 0, maxv)
    return w, h, 3, np.stack([r, g, b], axis=-1).astype(dtype)


# ------------------------------------------------------------------ #
# Progressive scans (T.81 §G.2): spectral selection + successive
# approximation over a persistent per-component coefficient store.


def _next_marker_pos(payload: bytes, pos: int) -> int:
    """Position of the next non-RST, non-stuffing marker at/after pos."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        m = payload[pos + 1]
        if m == 0x00:
            pos += 2  # byte stuffing — entropy data
        elif m == 0xFF:
            pos += 1  # fill byte
        elif 0xD0 <= m <= 0xD7:
            pos += 2  # restart marker
        else:
            return pos
    return n


def _decode_prog_scan(
    payload, data_pos, frame, scan, stores, huff_dc, huff_ac, dri,
    ss, se, ah, al,
):
    """Decode one progressive scan into ``stores``; returns the payload
    position of the marker following the scan's entropy data."""
    br = _BitReader(payload, data_pos)
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        _prog_dc_scan(br, frame, scan, stores, huff_dc, dri, ah, al)
    else:
        if len(scan) != 1:
            raise ValueError("AC scan must be single-component")
        _prog_ac_scan(br, scan[0], stores, huff_ac, dri, ss, se, ah, al)
    return _next_marker_pos(payload, br.pos)


def _prog_dc_scan(br, frame, scan, stores, huff_dc, dri, ah, al):
    interleaved = len(scan) > 1
    pred = [0] * len(scan)
    if interleaved:
        mcux = frame["comps"][0]["bw"] // frame["comps"][0]["h"]
        mcuy = frame["comps"][0]["bh"] // frame["comps"][0]["v"]
        units = mcux * mcuy
    else:
        comp = scan[0][0]
        units = comp["tbw"] * comp["tbh"]
    count = 0
    for u in range(units):
        if dri and count and count % dri == 0:
            if br.align_to_marker() is None:
                raise ValueError("missing restart marker")
            pred = [0] * len(scan)
        for si, (comp, td, _ta) in enumerate(scan):
            if interleaved:
                my, mx = divmod(u, comp["bw"] // comp["h"])
                blocks = [
                    (my * comp["v"] + by) * comp["bw"] + mx * comp["h"] + bx
                    for by in range(comp["v"])
                    for bx in range(comp["h"])
                ]
            else:
                by, bx = divmod(u, comp["tbw"])
                blocks = [by * comp["bw"] + bx]
            st = stores[comp["id"]]
            for bi in blocks:
                if ah == 0:  # DC first: point-transformed diff coding
                    s = huff_dc[td].decode(br)
                    if s > 15:  # corrupt table: DC category ≤ 15
                        raise ValueError("bad DC category")
                    diff = _extend(br.receive(s), s) if s else 0
                    pred[si] += diff
                    st[bi, 0] = pred[si] << al
                else:  # DC refinement: one bit per block
                    if br.read_bit():
                        st[bi, 0] |= 1 << al
        count += 1


def _prog_ac_scan(br, scan_entry, stores, huff_ac, dri, ss, se, ah, al):
    comp, _td, ta = scan_entry
    act = huff_ac[ta]
    st = stores[comp["id"]]
    zz = _ZIGZAG
    eobrun = 0
    count = 0
    for u in range(comp["tbw"] * comp["tbh"]):
        if dri and count and count % dri == 0:
            if br.align_to_marker() is None:
                raise ValueError("missing restart marker")
            eobrun = 0
        by, bx = divmod(u, comp["tbw"])
        blk = st[by * comp["bw"] + bx]
        if ah == 0:
            eobrun = _ac_first_block(br, act, blk, zz, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine_block(br, act, blk, zz, ss, se, al, eobrun)
        count += 1
    if eobrun != 0 and ah == 0:
        pass  # trailing EOB run covering the final blocks is legal


def _ac_first_block(br, act, blk, zz, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = act.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.receive(r)
                return eobrun
            k += 16
            continue
        k += r
        if k > se:
            raise ValueError("AC overflow")
        blk[zz[k]] = _extend(br.receive(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, act, blk, zz, ss, se, al, eobrun):
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = act.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    # refine EOBRUN = 2^r + ext (no -1: the EOB section
                    # below consumes this block's remainder and
                    # decrements — T.81 G.2 / jdphuff convention)
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break  # rest of block handled in the EOB section
                # r == 15 (ZRL): skip 16 zero-history positions
                newval = 0
            else:
                if s != 1:
                    raise ValueError("bad refinement size")
                newval = p1 if br.read_bit() else m1
            # advance over r zero-history positions, emitting correction
            # bits for every nonzero-history coefficient on the way
            while k <= se:
                c = int(blk[zz[k]])
                if c != 0:
                    if br.read_bit() and (c & p1) == 0:
                        blk[zz[k]] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[zz[k]] = newval
            k += 1
    if eobrun > 0:
        # correction bits only for the remainder of the band
        while k <= se:
            c = int(blk[zz[k]])
            if c != 0:
                if br.read_bit() and (c & p1) == 0:
                    blk[zz[k]] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


# ------------------------------------------------------------------ #
# Arithmetic-coded scans (SOF9/SOF10): T.81 Annex D coder + §F.2.4 /
# §G.2 procedures from jpeg_arith.py over the same coefficient stores.


def _arith_restart(dec, payload, dc_stats, ac_stats):
    """Resync at an RSTn marker: reinit the coder, zero all statistics
    (§F.2.4: restart = full reset of the arithmetic state)."""
    p = _ja.find_rst_marker(payload, dec.pos)
    if p is None:
        raise ValueError("missing restart marker")
    dec.restart_at(p + 2)
    for s in dc_stats.values():
        s[:] = bytes(len(s))
    for s in ac_stats.values():
        s[:] = bytes(len(s))


def _decode_scan_arith(payload, data_pos, frame, scan, qt, dac_dc, dac_ac, dri):
    mcux = frame["comps"][0]["bw"] // frame["comps"][0]["h"]
    mcuy = frame["comps"][0]["bh"] // frame["comps"][0]["v"]
    store = [
        np.zeros((comp["bh"] * comp["bw"], 64), dtype=np.int64)
        for comp, _td, _ta in scan
    ]
    dec = _ja.ArithDecoder(payload, data_pos)
    dc_stats = {td: _ja.new_dc_stats() for _c, td, _a in scan}
    ac_stats = {ta: _ja.new_ac_stats() for _c, _t, ta in scan}
    ctx = [0] * len(scan)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                _arith_restart(dec, payload, dc_stats, ac_stats)
                ctx = [0] * len(scan)
                pred = [0] * len(scan)
            for si, (comp, td, ta) in enumerate(scan):
                L, U = dac_dc.get(td, _ja.DEFAULT_DC_COND)
                kx = dac_ac.get(ta, _ja.DEFAULT_AC_COND)
                bw_c = comp["bw"]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        blk = store[si][row * bw_c + col]
                        pred[si] += _ja.decode_dc_diff(
                            dec, dc_stats[td], ctx, si, L, U
                        )
                        blk[0] = pred[si]
                        _ja.decode_ac_coefs(dec, ac_stats[ta], blk, _ZIGZAG, kx)
            mcu_count += 1
    stores = {comp["id"]: store[si] for si, (comp, _t, _a) in enumerate(scan)}
    return _assemble_image(frame, stores, qt)


def _decode_prog_scan_arith(
    payload, data_pos, frame, scan, stores, dac_dc, dac_ac, dri,
    ss, se, ah, al,
):
    """One progressive arithmetic scan into ``stores``; returns the
    position of the marker following the scan's entropy data."""
    dec = _ja.ArithDecoder(payload, data_pos)
    dc_stats = {td: _ja.new_dc_stats() for _c, td, _a in scan}
    ac_stats = {ta: _ja.new_ac_stats() for _c, _t, ta in scan}
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        interleaved = len(scan) > 1
        if interleaved:
            mcux = frame["comps"][0]["bw"] // frame["comps"][0]["h"]
            units = (
                frame["comps"][0]["bh"] // frame["comps"][0]["v"]
            ) * mcux
        else:
            comp = scan[0][0]
            units = comp["tbw"] * comp["tbh"]
        ctx = [0] * len(scan)
        pred = [0] * len(scan)
        for u in range(units):
            if dri and u and u % dri == 0:
                _arith_restart(dec, payload, dc_stats, ac_stats)
                ctx = [0] * len(scan)
                pred = [0] * len(scan)
            for si, (comp, td, _ta) in enumerate(scan):
                if interleaved:
                    my, mx = divmod(u, comp["bw"] // comp["h"])
                    blocks = [
                        (my * comp["v"] + by) * comp["bw"] + mx * comp["h"] + bx
                        for by in range(comp["v"])
                        for bx in range(comp["h"])
                    ]
                else:
                    by, bx = divmod(u, comp["tbw"])
                    blocks = [by * comp["bw"] + bx]
                st = stores[comp["id"]]
                L, U = dac_dc.get(td, _ja.DEFAULT_DC_COND)
                for bi in blocks:
                    if ah == 0:  # DC first (shifted-domain diff coding)
                        pred[si] += _ja.decode_dc_diff(
                            dec, dc_stats[td], ctx, si, L, U
                        )
                        st[bi, 0] = pred[si] << al
                    else:  # DC refinement: one fixed bit per block
                        _ja.decode_dc_refine(dec, st[bi], al)
    else:
        if len(scan) != 1:
            raise ValueError("AC scan must be single-component")
        comp, _td, ta = scan[0]
        kx = dac_ac.get(ta, _ja.DEFAULT_AC_COND)
        st = stores[comp["id"]]
        for u in range(comp["tbw"] * comp["tbh"]):
            if dri and u and u % dri == 0:
                _arith_restart(dec, payload, dc_stats, ac_stats)
            by, bx = divmod(u, comp["tbw"])
            blk = st[by * comp["bw"] + bx]
            if ah == 0:
                _ja.decode_ac_coefs(
                    dec, ac_stats[ta], blk, _ZIGZAG, kx, ss, se, al
                )
            else:
                _ja.decode_ac_refine(dec, ac_stats[ta], blk, _ZIGZAG, ss, se, al)
    return _next_marker_pos(payload, dec.pos)


# ------------------------------------------------------------------ #
# Closed-form oracle for constant-GRAY images (the twin-checkable path)

def constant_gray_decoded_level(c: int, quality: int = 75) -> int:
    """Decoded pixel level of a constant gray-``c`` RGB JPEG at
    ``quality`` through THIS codec, in pure integer math (the SQL twin
    mirrors it).  For r=g=b=c: Y=c, Cb=Cr=128 exactly, so chroma DC
    quantizes to 0 and color conversion is the identity; the Y block is
    DC-only: DC = 8(c-128); qdc = round-half-away(DC/q00);
    pixel = clamp(floor(qdc*q00/8 + 0.5) + 128).  Every step below is
    integer-exact (floor division), matching the float path bit-for-bit:
    /8 is exactly representable and ``_half_up``'s 1e-6 snap absorbs
    the ~1e-13 cosine-basis drift at exact .5 boundaries (d ≡ 4 mod 8,
    e.g. gray 7 at quality 30)."""
    q00 = int(quant_tables(quality)[0][0])
    v = 8 * (int(c) - 128)
    a = abs(v)
    qdc = (2 * a + q00) // (2 * q00)
    if v < 0:
        qdc = -qdc
    d = qdc * q00
    # floor(d/8 + 0.5) = floor((d+4)/8) with floor (not trunc) division
    p0 = (d + 4) // 8 + 128
    return max(0, min(255, p0))


def jpeg_exif_orientation(payload: Optional[bytes]) -> Optional[int]:
    """EXIF Orientation (tag 274, values 1..8) from the first APP1
    segment, or None.  EXIF is a TIFF stream ('Exif\\0\\0' prefix inside
    FFE1) — the walk reuses the TIFF IFD reader (operators/tiff.py), so
    both byte orders come for free.  A 100 TB image pipeline needs this
    before any resize: orientations 5-8 transpose the raster."""
    if not payload or not payload.startswith(b"\xff\xd8"):
        return None
    pos = 2
    n = len(payload)
    try:
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                return None
            m = payload[pos + 1]
            if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
                pos += 2
                continue
            if m in (0xD9, 0xDA):  # EOI / entropy-coded data: no EXIF
                return None
            (ln,) = _struct.unpack(">H", payload[pos + 2 : pos + 4])
            if m == 0xE1 and payload[pos + 4 : pos + 10] == b"Exif\x00\x00":
                from hquery_php_spark.operators.tiff import read_ifd0_tags

                tags = read_ifd0_tags(payload[pos + 10 : pos + 2 + ln])
                if not tags:
                    return None
                o = tags.get(274, [None])[0]
                return int(o) if o is not None and 1 <= o <= 8 else None
            pos += 2 + ln
    except (_struct.error, IndexError, ValueError):
        return None
    return None
