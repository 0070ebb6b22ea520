"""Pure-Python VP8 key-frame (lossy WebP) decoder per RFC 6386.

Lossy WebP is exactly one VP8 intra-only key frame.  This module
implements the full normative decode path: boolean arithmetic decoder
(RFC 6386 §7), frame/segmentation/filter/quantizer headers (§9),
key-frame intra mode decoding (§11), DCT token decoding with the
default probabilities and per-frame updates (§13), dequantization
(§14.1), inverse WHT/DCT (§14.3-14.4), all 4x4/8x8/16x16 intra
predictors with the frame-edge 127/129 fills and the stale
top-right quirk (§12), and both the normal and simple loop filters
(§15).

Normative constant tables live in vp8_tables.py (recovered from the
system libwebp binary by tools/extract_vp8_tables.py).  Conformance is
pinned by tests/test_vp8_conformance.py: the YUV planes produced here
are bit-exact with libwebp's own decoder on streams produced by
libwebp's encoder across content types, sizes and quality levels.

Scope: still images only (key frame).  Inter frames (golden/altref,
motion vectors) do not occur in WebP stills and raise ValueError.

This is NOT on the Spark hot path by default — the engine decodes
media inside mapInPandas batches (operators/multimodal.py) where each
payload is handled by exactly one Python worker; the pure-Python codec
keeps executors free of native image dependencies.
"""

from __future__ import annotations

import struct as _struct
from typing import List, Optional, Tuple

import numpy as np

from .vp8_tables import (
    AC_QLOOKUP,
    CAT_BASES,
    CAT_PROBS,
    COEFF_BANDS,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
    KF_UV_MODE_PROBS,
    KF_YMODE_PROBS,
    ZIGZAG,
)

__all__ = ["decode_vp8_yuv", "decode_vp8_rgba", "yuv420_to_rgb"]


# ---------------------------------------------------------------------------
# Boolean arithmetic decoder (RFC 6386 §7.3)
# ---------------------------------------------------------------------------


class _BoolDec:
    __slots__ = ("data", "pos", "range", "value", "bit_count", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.value = ((data[0] << 8) | data[1]) if self.n >= 2 else (
            (data[0] << 8) if self.n == 1 else 0
        )
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def bit(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        # renormalize
        while self.range < 128:
            self.value = (self.value << 1) & 0xFFFF
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < self.n:
                    self.value |= self.data[self.pos]
                self.pos += 1
        return ret

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit(128)
        return v

    def signed_literal(self, nbits: int) -> int:
        v = self.literal(nbits)
        return -v if self.bit(128) else v

    def flag_signed(self, nbits: int) -> int:
        """``flag ? magnitude+sign : 0`` — the header delta idiom."""
        return self.signed_literal(nbits) if self.bit(128) else 0

    def tree(self, tree: Tuple[int, ...], probs) -> int:
        i = 0
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


# mode trees (RFC 6386 §11.2); negative = leaf
_KF_YMODE_TREE = (-4, 2, 4, 6, -0, -1, -2, -3)  # B_PRED=4, DC=0,V=1,H=2,TM=3
_UV_MODE_TREE = (-0, 2, -1, 4, -2, -3)
_BMODE_TREE = (
    -0, 2,      # B_DC_PRED
    -9, 4,      # B_TM_PRED (index 9 in bmode numbering below)
    -1, 6,      # B_VE_PRED
    8, 12,
    -2, 10,     # B_HE_PRED
    -6, -5,     # B_RD_PRED, B_VR_PRED
    -3, 14,     # B_LD_PRED
    -7, 16,     # B_VL_PRED
    -4, -8,     # B_HD_PRED, B_HU_PRED
)
# bmode numbering used here: 0=DC 1=VE 2=HE 3=LD 4=HD 5=VR 6=RD 7=VL 8=HU 9=TM
# (tree leaves above map RFC names onto this order)
_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# KF_BMODE_PROBS was recovered from the libwebp binary, so its
# [above][left] axes are in *libwebp's* bmode enum order (B_DC, B_TM,
# B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) — which permutes
# {LD,RD,VR} relative to the RFC enum.  Context lookups must use the
# table's own numbering; this maps our local ids onto it (pinned by the
# crafted-stream differential tests vs libwebp's decoder).
_TO_SPEC = [0, 2, 3, 6, 8, 5, 4, 7, 9, 1]
# 16x16 mode -> spec bmode used as context for neighbours (§11.5)
_MB_TO_SPEC_B = {0: 0, 1: 2, 2: 3, 3: 1}  # DC->B_DC, V->B_VE, H->B_HE, TM->B_TM

_DCT_TOKEN_TREE_FIRST = 0  # decode starts at node 0 (EOB branch)


def _clamp_q(i: int, hi: int = 127) -> int:
    return 0 if i < 0 else hi if i > hi else i


# ---------------------------------------------------------------------------
# Inverse transforms (RFC 6386 §14.3-14.4) — exact integer arithmetic
# ---------------------------------------------------------------------------


def _iwht4x4(inp: List[int]) -> List[int]:
    out = [0] * 16
    tmp = [0] * 16
    for i in range(4):
        a1 = inp[i] + inp[12 + i]
        b1 = inp[4 + i] + inp[8 + i]
        c1 = inp[4 + i] - inp[8 + i]
        d1 = inp[i] - inp[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 3]
        b1 = tmp[4 * i + 1] + tmp[4 * i + 2]
        c1 = tmp[4 * i + 1] - tmp[4 * i + 2]
        d1 = tmp[4 * i] - tmp[4 * i + 3]
        out[4 * i] = (a1 + b1 + 3) >> 3
        out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3
        out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out


_C1 = 20091  # cos(pi/8)*sqrt(2)*2^16 - 2^16
_C2 = 35468  # sin(pi/8)*sqrt(2)*2^16


def _idct4x4(inp: List[int]) -> List[int]:
    tmp = [0] * 16
    out = [0] * 16
    for i in range(4):
        a1 = inp[i] + inp[8 + i]
        b1 = inp[i] - inp[8 + i]
        t1 = (inp[4 + i] * _C2) >> 16
        t2 = inp[12 + i] + ((inp[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = inp[4 + i] + ((inp[4 + i] * _C1) >> 16)
        t2 = (inp[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 2]
        b1 = tmp[4 * i] - tmp[4 * i + 2]
        t1 = (tmp[4 * i + 1] * _C2) >> 16
        t2 = tmp[4 * i + 3] + ((tmp[4 * i + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[4 * i + 1] + ((tmp[4 * i + 1] * _C1) >> 16)
        t2 = (tmp[4 * i + 3] * _C2) >> 16
        d1 = t1 + t2
        out[4 * i] = (a1 + d1 + 4) >> 3
        out[4 * i + 3] = (a1 - d1 + 4) >> 3
        out[4 * i + 1] = (b1 + c1 + 4) >> 3
        out[4 * i + 2] = (b1 - c1 + 4) >> 3
    return out


# ---------------------------------------------------------------------------
# Intra predictors (RFC 6386 §12)
# ---------------------------------------------------------------------------


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _avg2(a: int, b: int) -> int:
    return (a + b + 1) >> 1


def _avg3(a: int, b: int, c: int) -> int:
    return (a + 2 * b + c + 2) >> 2


def _pred4(mode: int, A: List[int], L: List[int], P: int) -> List[List[int]]:
    """4x4 sub-block predictor.  A = 8 above pixels (incl. above-right),
    L = 4 left, P = above-left.  Local mode numbering (see _BMODE_TREE)."""
    o = [[0] * 4 for _ in range(4)]
    if mode == 0:  # B_DC
        dc = (sum(A[:4]) + sum(L) + 4) >> 3
        for r in range(4):
            for c in range(4):
                o[r][c] = dc
    elif mode == 9:  # B_TM
        for r in range(4):
            for c in range(4):
                o[r][c] = _clip255(L[r] + A[c] - P)
    elif mode == 1:  # B_VE
        row = [
            _avg3(P, A[0], A[1]),
            _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
            _avg3(A[2], A[3], A[4]),
        ]
        for r in range(4):
            o[r] = row[:]
    elif mode == 2:  # B_HE
        col = [
            _avg3(P, L[0], L[1]),
            _avg3(L[0], L[1], L[2]),
            _avg3(L[1], L[2], L[3]),
            _avg3(L[2], L[3], L[3]),
        ]
        for r in range(4):
            for c in range(4):
                o[r][c] = col[r]
    elif mode == 3:  # B_LD
        o[0][0] = _avg3(A[0], A[1], A[2])
        o[0][1] = o[1][0] = _avg3(A[1], A[2], A[3])
        o[0][2] = o[1][1] = o[2][0] = _avg3(A[2], A[3], A[4])
        o[0][3] = o[1][2] = o[2][1] = o[3][0] = _avg3(A[3], A[4], A[5])
        o[1][3] = o[2][2] = o[3][1] = _avg3(A[4], A[5], A[6])
        o[2][3] = o[3][2] = _avg3(A[5], A[6], A[7])
        o[3][3] = _avg3(A[6], A[7], A[7])
    elif mode == 6:  # B_RD
        pp = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        o[3][0] = _avg3(pp[0], pp[1], pp[2])
        o[3][1] = o[2][0] = _avg3(pp[1], pp[2], pp[3])
        o[3][2] = o[2][1] = o[1][0] = _avg3(pp[2], pp[3], pp[4])
        o[3][3] = o[2][2] = o[1][1] = o[0][0] = _avg3(pp[3], pp[4], pp[5])
        o[2][3] = o[1][2] = o[0][1] = _avg3(pp[4], pp[5], pp[6])
        o[1][3] = o[0][2] = _avg3(pp[5], pp[6], pp[7])
        o[0][3] = _avg3(pp[6], pp[7], pp[8])
    elif mode == 5:  # B_VR
        pp = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        o[3][0] = _avg3(pp[1], pp[2], pp[3])
        o[2][0] = _avg3(pp[2], pp[3], pp[4])
        o[1][0] = o[3][1] = _avg3(pp[3], pp[4], pp[5])
        o[0][0] = o[2][1] = _avg2(pp[4], pp[5])
        o[1][1] = o[3][2] = _avg3(pp[4], pp[5], pp[6])
        o[0][1] = o[2][2] = _avg2(pp[5], pp[6])
        o[1][2] = o[3][3] = _avg3(pp[5], pp[6], pp[7])
        o[0][2] = o[2][3] = _avg2(pp[6], pp[7])
        o[1][3] = _avg3(pp[6], pp[7], pp[8])
        o[0][3] = _avg2(pp[7], pp[8])
    elif mode == 7:  # B_VL
        o[0][0] = _avg2(A[0], A[1])
        o[1][0] = _avg3(A[0], A[1], A[2])
        o[2][0] = o[0][1] = _avg2(A[1], A[2])
        o[1][1] = o[3][0] = _avg3(A[1], A[2], A[3])
        o[2][1] = o[0][2] = _avg2(A[2], A[3])
        o[3][1] = o[1][2] = _avg3(A[2], A[3], A[4])
        o[0][3] = o[2][2] = _avg2(A[3], A[4])
        o[1][3] = o[3][2] = _avg3(A[3], A[4], A[5])
        o[2][3] = _avg3(A[4], A[5], A[6])
        o[3][3] = _avg3(A[5], A[6], A[7])
    elif mode == 4:  # B_HD
        pp = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2]]
        o[3][0] = _avg2(pp[0], pp[1])
        o[3][1] = _avg3(pp[0], pp[1], pp[2])
        o[2][0] = o[3][2] = _avg2(pp[1], pp[2])
        o[2][1] = o[3][3] = _avg3(pp[1], pp[2], pp[3])
        o[1][0] = o[2][2] = _avg2(pp[2], pp[3])
        o[1][1] = o[2][3] = _avg3(pp[2], pp[3], pp[4])
        o[0][0] = o[1][2] = _avg2(pp[3], pp[4])
        o[0][1] = o[1][3] = _avg3(pp[3], pp[4], pp[5])
        o[0][2] = _avg3(pp[4], pp[5], pp[6])
        o[0][3] = _avg3(pp[5], pp[6], pp[7])
    elif mode == 8:  # B_HU
        o[0][0] = _avg2(L[0], L[1])
        o[0][1] = _avg3(L[0], L[1], L[2])
        o[0][2] = o[1][0] = _avg2(L[1], L[2])
        o[0][3] = o[1][1] = _avg3(L[1], L[2], L[3])
        o[1][2] = o[2][0] = _avg2(L[2], L[3])
        o[1][3] = o[2][1] = _avg3(L[2], L[3], L[3])
        o[2][2] = o[2][3] = L[3]
        for c in range(4):
            o[3][c] = L[3]
    else:
        raise ValueError(f"bad bmode {mode}")
    return o


# ---------------------------------------------------------------------------
# Header containers
# ---------------------------------------------------------------------------


class _FrameHeader:
    pass


def _parse_headers(bd: _BoolDec, hdr: _FrameHeader) -> None:
    """Everything in partition 0 before the per-MB data (RFC 6386 §9)."""
    hdr.color_space = bd.bit(128)
    hdr.clamping_type = bd.bit(128)

    # segmentation (§9.3)
    hdr.segmentation = bd.bit(128)
    hdr.update_mb_seg_map = 0
    hdr.seg_tree_probs = [255, 255, 255]
    hdr.seg_abs = 0
    hdr.seg_q = [0, 0, 0, 0]
    hdr.seg_lf = [0, 0, 0, 0]
    if hdr.segmentation:
        hdr.update_mb_seg_map = bd.bit(128)
        update_data = bd.bit(128)
        if update_data:
            hdr.seg_abs = bd.bit(128)
            for i in range(4):
                hdr.seg_q[i] = bd.flag_signed(7)
            for i in range(4):
                hdr.seg_lf[i] = bd.flag_signed(6)
        if hdr.update_mb_seg_map:
            for i in range(3):
                hdr.seg_tree_probs[i] = bd.literal(8) if bd.bit(128) else 255

    # loop filter (§9.4)
    hdr.filter_simple = bd.bit(128)
    hdr.filter_level = bd.literal(6)
    hdr.sharpness = bd.literal(3)
    hdr.lf_delta_enabled = bd.bit(128)
    hdr.ref_lf_deltas = [0, 0, 0, 0]
    hdr.mode_lf_deltas = [0, 0, 0, 0]
    if hdr.lf_delta_enabled:
        if bd.bit(128):  # mode_ref_lf_delta_update
            for i in range(4):
                if bd.bit(128):
                    hdr.ref_lf_deltas[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.bit(128):
                    hdr.mode_lf_deltas[i] = bd.signed_literal(6)

    # token partitions (§9.5)
    hdr.n_parts = 1 << bd.literal(2)

    # quantizers (§9.6)
    hdr.y_ac_qi = bd.literal(7)
    hdr.y_dc_delta = bd.flag_signed(4)
    hdr.y2_dc_delta = bd.flag_signed(4)
    hdr.y2_ac_delta = bd.flag_signed(4)
    hdr.uv_dc_delta = bd.flag_signed(4)
    hdr.uv_ac_delta = bd.flag_signed(4)

    # refresh entropy (§9.7; key frame)
    hdr.refresh_entropy = bd.bit(128)

    # token probability updates (§13.4)
    probs = [[[row[:] for row in ctx] for ctx in band] for band in COEFF_PROBS]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    if bd.bit(COEFF_UPDATE_PROBS[t][b][c][p]):
                        probs[t][b][c][p] = bd.literal(8)
    hdr.coeff_probs = probs

    # per-MB skip flag (§9.10)
    hdr.use_skip = bd.bit(128)
    hdr.skip_prob = bd.literal(8) if hdr.use_skip else 0


def _quantizers(hdr: _FrameHeader):
    """Per-segment (y1dc, y1ac, y2dc, y2ac, uvdc, uvac) per RFC §14.1."""
    out = []
    for s in range(4):
        if hdr.segmentation:
            q = hdr.seg_q[s] if hdr.seg_abs else hdr.y_ac_qi + hdr.seg_q[s]
        else:
            q = hdr.y_ac_qi
        q = _clamp_q(q)
        y1dc = DC_QLOOKUP[_clamp_q(q + hdr.y_dc_delta)]
        y1ac = AC_QLOOKUP[q]
        y2dc = DC_QLOOKUP[_clamp_q(q + hdr.y2_dc_delta)] * 2
        y2ac = AC_QLOOKUP[_clamp_q(q + hdr.y2_ac_delta)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[_clamp_q(q + hdr.uv_dc_delta, 117)]
        uvac = AC_QLOOKUP[_clamp_q(q + hdr.uv_ac_delta)]
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


# ---------------------------------------------------------------------------
# Coefficient decoding (RFC 6386 §13)
# ---------------------------------------------------------------------------


def _decode_coeffs(bd, plane_probs, ctx, first, qdc, qac, out):
    """Decode one 4x4 block's tokens into out[16] (dequantized, natural
    order).  Returns 1 if any non-zero coefficient was decoded."""
    n = first
    nz = 0
    check_eob = True
    bit = bd.bit
    bands = COEFF_BANDS
    zz = ZIGZAG
    while n < 16:
        probs = plane_probs[bands[n]][ctx]
        if check_eob and not bit(probs[0]):
            break
        if not bit(probs[1]):
            ctx = 0
            check_eob = False
            n += 1
            continue
        check_eob = True
        if not bit(probs[2]):
            v = 1
            ctx = 1
        else:
            ctx = 2
            if not bit(probs[3]):
                if not bit(probs[4]):
                    v = 2
                else:
                    v = 3 + bit(probs[5])
            else:
                if not bit(probs[6]):
                    if not bit(probs[7]):
                        cat = 0
                    else:
                        cat = 1
                else:
                    if not bit(probs[8]):
                        cat = 2 + bit(probs[9])
                    else:
                        cat = 4 + bit(probs[10])
                v = CAT_BASES[cat]
                extra = 0
                for p in CAT_PROBS[cat]:
                    extra = (extra << 1) | bit(p)
                v += extra
        if bit(128):
            v = -v
        out[zz[n]] = v * (qdc if n == 0 else qac)
        nz = 1
        n += 1
    return nz


# ---------------------------------------------------------------------------
# Loop filter (RFC 6386 §15) — scalar exact
# ---------------------------------------------------------------------------


def _s(v: int) -> int:
    """uint8 pixel -> signed (-128..127) domain."""
    return v - 128


def _u(v: int) -> int:
    v += 128
    return 0 if v < 0 else 255 if v > 255 else v


def _c(v: int) -> int:
    """clamp to signed char."""
    return -128 if v < -128 else 127 if v > 127 else v


def _filter_mask(limit, ilimit, p3, p2, p1, p0, q0, q1, q2, q3) -> bool:
    return (
        abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= limit
        and abs(p3 - p2) <= ilimit
        and abs(p2 - p1) <= ilimit
        and abs(p1 - p0) <= ilimit
        and abs(q1 - q0) <= ilimit
        and abs(q2 - q1) <= ilimit
        and abs(q3 - q2) <= ilimit
    )


def _hev(thresh, p1, p0, q0, q1) -> bool:
    return abs(p1 - p0) > thresh or abs(q1 - q0) > thresh


def _common_adjust(use_outer, p1, p0, q0, q1):
    """2-tap filter core; returns (a, p0', q0')."""
    a = _c((p1 - q1) if use_outer else 0)
    a = _c(a + 3 * (q0 - p0))
    f1 = _c(a + 4) >> 3
    f2 = _c(a + 3) >> 3
    return f1, _c(p0 + f2), _c(q0 - f1)


def _subblock_filter(hev_t, ilimit, limit, px, idx):
    """Normal filter, interior edge, on pixel vector px at offsets idx
    (idx[3] = p0, idx[4] = q0)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (_s(px[i]) for i in idx)
    if not _filter_mask(limit, ilimit, p3, p2, p1, p0, q0, q1, q2, q3):
        return
    hv = _hev(hev_t, p1, p0, q0, q1)
    f1, np0, nq0 = _common_adjust(hv, p1, p0, q0, q1)
    px[idx[3]] = _u(np0)
    px[idx[4]] = _u(nq0)
    if not hv:
        a = (f1 + 1) >> 1
        px[idx[2]] = _u(_c(p1 + a))
        px[idx[5]] = _u(_c(q1 - a))


def _mbedge_filter(hev_t, ilimit, limit, px, idx):
    """Normal filter, macroblock edge (3-tap wide) per §15.3."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (_s(px[i]) for i in idx)
    if not _filter_mask(limit, ilimit, p3, p2, p1, p0, q0, q1, q2, q3):
        return
    if _hev(hev_t, p1, p0, q0, q1):
        _, np0, nq0 = _common_adjust(True, p1, p0, q0, q1)
        px[idx[3]] = _u(np0)
        px[idx[4]] = _u(nq0)
        return
    w = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a = _c((27 * w + 63) >> 7)
    p0n, q0n = _c(p0 + a), _c(q0 - a)
    a = _c((18 * w + 63) >> 7)
    p1n, q1n = _c(p1 + a), _c(q1 - a)
    a = _c((9 * w + 63) >> 7)
    p2n, q2n = _c(p2 + a), _c(q2 - a)
    px[idx[1]] = _u(p2n)
    px[idx[2]] = _u(p1n)
    px[idx[3]] = _u(p0n)
    px[idx[4]] = _u(q0n)
    px[idx[5]] = _u(q1n)
    px[idx[6]] = _u(q2n)


def _simple_filter(limit, px, idx):
    """Simple loop filter (§15.1): 4 pixels around the edge, luma only."""
    p1, p0, q0, q1 = (_s(px[i]) for i in idx)
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= limit:
        _, np0, nq0 = _common_adjust(True, p1, p0, q0, q1)
        px[idx[1]] = _u(np0)
        px[idx[2]] = _u(nq0)


# ---------------------------------------------------------------------------
# Decoder main
# ---------------------------------------------------------------------------


class _MBInfo:
    __slots__ = ("seg", "skip", "is_b", "fl", "inner")


def decode_vp8_yuv(data: bytes):
    """Decode a VP8 key-frame stream (the payload of a WebP ``VP8 ``
    chunk) into (width, height, Y, U, V) uint8 numpy planes."""
    if len(data) < 10:
        raise ValueError("truncated VP8")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    key_frame = not (tag & 1)
    version = (tag >> 1) & 7
    first_part_size = tag >> 5
    if not key_frame:
        raise ValueError("not a key frame (WebP stills are key frames)")
    if version > 3:
        raise ValueError(f"bad VP8 profile {version}")
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad start code")
    w = (data[6] | (data[7] << 8)) & 0x3FFF
    h = (data[8] | (data[9] << 8)) & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("zero dimensions")
    if first_part_size == 0 or 10 + first_part_size > len(data):
        raise ValueError("partition 0 missing or overruns buffer")

    bd = _BoolDec(data[10 : 10 + first_part_size])
    hdr = _FrameHeader()
    _parse_headers(bd, hdr)

    # token partition table + decoders (§9.5)
    pos = 10 + first_part_size
    sizes = []
    for _ in range(hdr.n_parts - 1):
        if pos + 3 > len(data):
            raise ValueError("bad partition table")
        sizes.append(data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16))
        pos += 3
    parts = []
    for i in range(hdr.n_parts):
        end = pos + sizes[i] if i < hdr.n_parts - 1 else len(data)
        if end > len(data) or pos > end:
            raise ValueError("bad partition size")
        parts.append(_BoolDec(data[pos:end]))
        pos = end

    quant = _quantizers(hdr)

    mb_w = (w + 15) >> 4
    mb_h = (h + 15) >> 4

    # planes with a 1-px shared border for predictors; -1 marks
    # "unavailable" for the DC edge variants (only possible along the
    # synthetic border).  Working dtype int32; cropped to uint8 at end.
    W16, H16 = mb_w * 16, mb_h * 16
    W8, H8 = mb_w * 8, mb_h * 8
    Y = np.empty((H16, W16), np.int32)
    U = np.empty((H8, W8), np.int32)
    V = np.empty((H8, W8), np.int32)

    # per-MB first pass state
    above_nz = [[0] * 9 for _ in range(mb_w)]  # 4 y, 2 u, 2 v, 1 y2
    above_bmodes = [[0] * 4 for _ in range(mb_w)]  # spec numbering
    infos: List[_MBInfo] = []

    # stale top-right staging: ytop[x] = bottom row (16) of MB above
    ytop = [np.full(16, 127, np.int32) for _ in range(mb_w)]
    utop = [np.full(8, 127, np.int32) for _ in range(mb_w)]
    vtop = [np.full(8, 127, np.int32) for _ in range(mb_w)]

    coeffs = [0] * 400  # 25 blocks x 16
    ybuf = np.empty((17, 21), np.int32)  # border row/col + 16x16 (+4 TR)
    ubuf = np.empty((9, 9), np.int32)
    vbuf = np.empty((9, 9), np.int32)

    for mb_y in range(mb_h):
        left_nz = [0] * 9
        left_bmodes = [0] * 4
        yleft = np.full(16, 129, np.int32)
        uleft = np.full(8, 129, np.int32)
        vleft = np.full(8, 129, np.int32)
        y_topleft = u_topleft = v_topleft = 127 if mb_y == 0 else 129
        tbd = parts[mb_y & (hdr.n_parts - 1)]

        for mb_x in range(mb_w):
            info = _MBInfo()
            # ---- mode parsing (partition 0) ----
            seg = 0
            if hdr.segmentation and hdr.update_mb_seg_map:
                seg = bd.tree(_SEGMENT_TREE, hdr.seg_tree_probs)
            info.seg = seg
            skip_flag = bd.bit(hdr.skip_prob) if hdr.use_skip else 0

            ymode = bd.tree(_KF_YMODE_TREE, KF_YMODE_PROBS)
            is_b = ymode == 4
            info.is_b = is_b
            bmodes_spec = [0] * 16
            if is_b:
                bsub = [[0] * 4 for _ in range(4)]
                for sy in range(4):
                    for sx in range(4):
                        above_m = (
                            above_bmodes[mb_x][sx] if sy == 0 else bsub[sy - 1][sx]
                        )
                        left_m = left_bmodes[sy] if sx == 0 else bsub[sy][sx - 1]
                        local = bd.tree(
                            _BMODE_TREE, KF_BMODE_PROBS[above_m][left_m]
                        )
                        bsub[sy][sx] = _TO_SPEC[local]
                        bmodes_spec[sy * 4 + sx] = local
                above_bmodes[mb_x] = bsub[3][:]
                left_bmodes = [bsub[r][3] for r in range(4)]
            else:
                spec_b = _MB_TO_SPEC_B[ymode]
                above_bmodes[mb_x] = [spec_b] * 4
                left_bmodes = [spec_b] * 4
            uvmode = bd.tree(_UV_MODE_TREE, KF_UV_MODE_PROBS)

            # ---- residuals (token partition) ----
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = quant[seg]
            for i in range(400):
                coeffs[i] = 0
            has_coeffs = False
            nz_y = [[0] * 4 for _ in range(4)]
            nz_u = [[0, 0], [0, 0]]
            nz_v = [[0, 0], [0, 0]]
            if skip_flag:
                for i in range(8):
                    left_nz[i] = 0
                    above_nz[mb_x][i] = 0
                if not is_b:
                    left_nz[8] = 0
                    above_nz[mb_x][8] = 0
            else:
                probs = hdr.coeff_probs
                if not is_b:
                    # Y2 (plane 1)
                    ctx = left_nz[8] + above_nz[mb_x][8]
                    y2 = [0] * 16
                    nz = _decode_coeffs(tbd, probs[1], ctx, 0, y2dc, y2ac, y2)
                    left_nz[8] = above_nz[mb_x][8] = nz
                    has_coeffs = has_coeffs or nz
                    wht = _iwht4x4(y2)
                    plane_y = probs[0]
                    first = 1
                else:
                    wht = None
                    plane_y = probs[3]
                    first = 0
                for sy in range(4):
                    for sx in range(4):
                        ctx = left_nz[sy] + above_nz[mb_x][sx]
                        base = (sy * 4 + sx) * 16
                        blk = coeffs[base : base + 16]
                        nz = _decode_coeffs(
                            tbd, plane_y, ctx, first, y1dc, y1ac, blk
                        )
                        if wht is not None:
                            blk[0] = wht[sy * 4 + sx]
                        coeffs[base : base + 16] = blk
                        left_nz[sy] = above_nz[mb_x][sx] = nz
                        nz_y[sy][sx] = nz or (wht is not None and blk[0] != 0)
                        has_coeffs = has_coeffs or nz_y[sy][sx]
                for pl, nzm, off in ((0, nz_u, 256), (1, nz_v, 320)):
                    for sy in range(2):
                        for sx in range(2):
                            ctx = (
                                left_nz[4 + 2 * pl + sy]
                                + above_nz[mb_x][4 + 2 * pl + sx]
                            )
                            base = off + (sy * 2 + sx) * 16
                            blk = coeffs[base : base + 16]
                            nz = _decode_coeffs(
                                tbd, probs[2], ctx, 0, uvdc, uvac, blk
                            )
                            coeffs[base : base + 16] = blk
                            left_nz[4 + 2 * pl + sy] = nz
                            above_nz[mb_x][4 + 2 * pl + sx] = nz
                            nzm[sy][sx] = nz
                            has_coeffs = has_coeffs or nz
                if wht is not None and any(c != 0 for c in wht):
                    has_coeffs = True

            info.skip = not has_coeffs
            info.inner = is_b or has_coeffs

            # loop-filter level for this MB (§15.2)
            if hdr.segmentation:
                fl = (
                    hdr.seg_lf[seg]
                    if hdr.seg_abs
                    else hdr.filter_level + hdr.seg_lf[seg]
                )
            else:
                fl = hdr.filter_level
            if hdr.lf_delta_enabled:
                fl += hdr.ref_lf_deltas[0]  # intra frame
                if is_b:
                    fl += hdr.mode_lf_deltas[0]
            info.fl = 0 if fl < 0 else 63 if fl > 63 else fl
            infos.append(info)

            # ---- reconstruction ----
            x0, y0 = mb_x * 16, mb_y * 16
            cx0, cy0 = mb_x * 8, mb_y * 8

            # luma local buffer with border
            ybuf[0, 0] = y_topleft
            ybuf[0, 1:17] = 127 if mb_y == 0 else ytop[mb_x]
            if mb_y == 0:
                ybuf[0, 17:21] = 127
            elif mb_x + 1 < mb_w:
                ybuf[0, 17:21] = ytop[mb_x + 1][:4]
            else:
                ybuf[0, 17:21] = ytop[mb_x][15]
            ybuf[1:17, 0] = yleft
            # DC-variant availability markers (only frame edges)
            has_above = mb_y > 0
            has_left = mb_x > 0

            if not is_b:
                _pred_mb(ybuf, 16, ymode, has_above, has_left)
                for sy in range(4):
                    for sx in range(4):
                        if nz_y[sy][sx]:
                            base = (sy * 4 + sx) * 16
                            _add_residual(
                                ybuf, 1 + sy * 4, 1 + sx * 4, coeffs, base
                            )
            else:
                for sy in range(4):
                    for sx in range(4):
                        r0, c0 = 1 + sy * 4, 1 + sx * 4
                        A8 = [0] * 8
                        row_above = ybuf[r0 - 1]
                        for i in range(4):
                            A8[i] = int(row_above[c0 + i])
                        if sx == 3:
                            for i in range(4):
                                A8[4 + i] = int(ybuf[0, 17 + i])
                        else:
                            for i in range(4):
                                A8[4 + i] = int(row_above[c0 + 4 + i])
                        L4 = [int(ybuf[r0 + i, c0 - 1]) for i in range(4)]
                        P = int(ybuf[r0 - 1, c0 - 1])
                        pred = _pred4(bmodes_spec[sy * 4 + sx], A8, L4, P)
                        base = (sy * 4 + sx) * 16
                        if nz_y[sy][sx]:
                            res = _idct4x4(coeffs[base : base + 16])
                            for r in range(4):
                                prow = pred[r]
                                for c in range(4):
                                    ybuf[r0 + r, c0 + c] = _clip255(
                                        prow[c] + res[r * 4 + c]
                                    )
                        else:
                            for r in range(4):
                                prow = pred[r]
                                for c in range(4):
                                    ybuf[r0 + r, c0 + c] = prow[c]

            # chroma
            for buf, top, left, tl, nzm, off in (
                (ubuf, utop, uleft, u_topleft, nz_u, 256),
                (vbuf, vtop, vleft, v_topleft, nz_v, 320),
            ):
                buf[0, 0] = tl
                buf[0, 1:9] = 127 if mb_y == 0 else top[mb_x]
                buf[1:9, 0] = left
                _pred_mb(buf, 8, uvmode, has_above, has_left)
                for sy in range(2):
                    for sx in range(2):
                        if nzm[sy][sx]:
                            base = off + (sy * 2 + sx) * 16
                            _add_residual(
                                buf, 1 + sy * 4, 1 + sx * 4, coeffs, base
                            )

            # write out + roll neighbour state
            Y[y0 : y0 + 16, x0 : x0 + 16] = ybuf[1:17, 1:17]
            U[cy0 : cy0 + 8, cx0 : cx0 + 8] = ubuf[1:9, 1:9]
            V[cy0 : cy0 + 8, cx0 : cx0 + 8] = vbuf[1:9, 1:9]

            y_topleft = int(ytop[mb_x][15]) if mb_y > 0 else 127
            u_topleft = int(utop[mb_x][7]) if mb_y > 0 else 127
            v_topleft = int(vtop[mb_x][7]) if mb_y > 0 else 127
            ytop[mb_x] = ybuf[16, 1:17].copy()
            utop[mb_x] = ubuf[8, 1:9].copy()
            vtop[mb_x] = vbuf[8, 1:9].copy()
            yleft = ybuf[1:17, 16].copy()
            uleft = ubuf[1:9, 8].copy()
            vleft = vbuf[1:9, 8].copy()

    # ---- loop filter (§15) ----
    if hdr.filter_level > 0 or hdr.segmentation or hdr.lf_delta_enabled:
        _loop_filter(Y, U, V, infos, hdr, mb_w, mb_h)

    y8 = Y[:h, :w].astype(np.uint8)
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    u8 = U[:ch, :cw].astype(np.uint8)
    v8 = V[:ch, :cw].astype(np.uint8)
    return w, h, y8, u8, v8


def _pred_mb(buf, size, mode, has_above, has_left):
    """Whole-MB (16x16/8x8) intra prediction honouring DC edge cases."""
    if mode == 0:
        above = buf[0, 1 : 1 + size]
        left = buf[1 : 1 + size, 0]
        if has_above and has_left:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                5 if size == 16 else 4
            )
        elif has_above:
            dc = (int(above.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        elif has_left:
            dc = (int(left.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        buf[1 : 1 + size, 1 : 1 + size] = dc
    elif mode == 1:  # V
        buf[1 : 1 + size, 1 : 1 + size] = buf[0, 1 : 1 + size][None, :]
    elif mode == 2:  # H
        buf[1 : 1 + size, 1 : 1 + size] = buf[1 : 1 + size, 0][:, None]
    else:  # TM
        tl = int(buf[0, 0])
        blk = (
            buf[1 : 1 + size, 0][:, None].astype(np.int64)
            + buf[0, 1 : 1 + size][None, :]
            - tl
        )
        buf[1 : 1 + size, 1 : 1 + size] = np.clip(blk, 0, 255)


def _add_residual(buf, r0, c0, coeffs, base):
    res = _idct4x4(coeffs[base : base + 16])
    for r in range(4):
        row = buf[r0 + r]
        for c in range(4):
            v = int(row[c0 + c]) + res[r * 4 + c]
            row[c0 + c] = 0 if v < 0 else 255 if v > 255 else v


# ---------------------------------------------------------------------------
# Loop filter driver
# ---------------------------------------------------------------------------


def _filter_params(fl: int, sharpness: int):
    ilimit = fl
    if sharpness > 0:
        ilimit >>= 2 if sharpness > 4 else 1
        if ilimit > 9 - sharpness:
            ilimit = 9 - sharpness
    if ilimit < 1:
        ilimit = 1
    hev_t = 2 if fl >= 40 else 1 if fl >= 15 else 0
    return ilimit, hev_t


def _loop_filter(Y, U, V, infos, hdr, mb_w, mb_h):
    simple = hdr.filter_simple
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            info = infos[mb_y * mb_w + mb_x]
            fl = info.fl
            if fl == 0:
                continue
            ilimit, hev_t = _filter_params(fl, hdr.sharpness)
            mb_limit = (fl + 2) * 2 + ilimit
            sb_limit = fl * 2 + ilimit
            x0, y0 = mb_x * 16, mb_y * 16
            cx0, cy0 = mb_x * 8, mb_y * 8
            if simple:
                if mb_x > 0:
                    _edge_v(Y, y0, x0, 16, mb_limit, 0, 0, True, True)
                if info.inner:
                    for dx in (4, 8, 12):
                        _edge_v(Y, y0, x0 + dx, 16, sb_limit, 0, 0, True, False)
                if mb_y > 0:
                    _edge_h(Y, y0, x0, 16, mb_limit, 0, 0, True, True)
                if info.inner:
                    for dy in (4, 8, 12):
                        _edge_h(Y, y0 + dy, x0, 16, sb_limit, 0, 0, True, False)
            else:
                if mb_x > 0:
                    _edge_v(Y, y0, x0, 16, mb_limit, ilimit, hev_t, False, True)
                    _edge_v(U, cy0, cx0, 8, mb_limit, ilimit, hev_t, False, True)
                    _edge_v(V, cy0, cx0, 8, mb_limit, ilimit, hev_t, False, True)
                if info.inner:
                    for dx in (4, 8, 12):
                        _edge_v(Y, y0, x0 + dx, 16, sb_limit, ilimit, hev_t, False, False)
                    _edge_v(U, cy0, cx0 + 4, 8, sb_limit, ilimit, hev_t, False, False)
                    _edge_v(V, cy0, cx0 + 4, 8, sb_limit, ilimit, hev_t, False, False)
                if mb_y > 0:
                    _edge_h(Y, y0, x0, 16, mb_limit, ilimit, hev_t, False, True)
                    _edge_h(U, cy0, cx0, 8, mb_limit, ilimit, hev_t, False, True)
                    _edge_h(V, cy0, cx0, 8, mb_limit, ilimit, hev_t, False, True)
                if info.inner:
                    for dy in (4, 8, 12):
                        _edge_h(Y, y0 + dy, x0, 16, sb_limit, ilimit, hev_t, False, False)
                    _edge_h(U, cy0 + 4, cx0, 8, sb_limit, ilimit, hev_t, False, False)
                    _edge_h(V, cy0 + 4, cx0, 8, sb_limit, ilimit, hev_t, False, False)


def _edge_v(P, row0, col, n, limit, ilimit, hev_t, simple, mbedge):
    """Vertical edge at x=col (filtering across columns), n rows."""
    h, w = P.shape
    if col <= 0 or col >= w:
        return
    for r in range(row0, min(row0 + n, h)):
        line = P[r]
        if simple:
            idx = (col - 2, col - 1, col, col + 1)
            _simple_filter(limit, line, idx)
        else:
            idx = (
                col - 4, col - 3, col - 2, col - 1,
                col, col + 1, col + 2, col + 3,
            )
            if mbedge:
                _mbedge_filter(hev_t, ilimit, limit, line, idx)
            else:
                _subblock_filter(hev_t, ilimit, limit, line, idx)


def _edge_h(P, row, col0, n, limit, ilimit, hev_t, simple, mbedge):
    """Horizontal edge at y=row (filtering across rows), n cols."""
    h, w = P.shape
    if row <= 0 or row >= h:
        return
    for c in range(col0, min(col0 + n, w)):
        line = P[:, c]
        if simple:
            idx = (row - 2, row - 1, row, row + 1)
            _simple_filter(limit, line, idx)
        else:
            idx = (
                row - 4, row - 3, row - 2, row - 1,
                row, row + 1, row + 2, row + 3,
            )
            if mbedge:
                _mbedge_filter(hev_t, ilimit, limit, line, idx)
            else:
                _subblock_filter(hev_t, ilimit, limit, line, idx)


# ---------------------------------------------------------------------------
# YUV -> RGB (non-normative; BT.601 limited range, nearest-neighbour
# chroma upsample — documented choice, VP8 does not specify conversion)
# ---------------------------------------------------------------------------


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    h, w = y.shape
    uf = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int32)
    vf = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int32)
    c = y.astype(np.int32) - 16
    d = uf - 128
    e = vf - 128
    r = (298 * c + 409 * e + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    b = (298 * c + 516 * d + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def decode_vp8_rgba(data: bytes):
    """VP8 key-frame payload → (w, h, 4, RGBA uint8) with opaque alpha."""
    w, h, y, u, v = decode_vp8_yuv(data)
    rgb = yuv420_to_rgb(y, u, v)
    rgba = np.dstack([rgb, np.full((h, w, 1), 255, np.uint8)])
    return w, h, 4, rgba


# ---------------------------------------------------------------------------
# Boolean arithmetic encoder (RFC 6386 §7.1-7.2) and a minimal key-frame
# stream writer.  The writer exists for fixture generation / round-trip
# testing: it emits conformant streams from explicit per-MB mode +
# quantized-coefficient specs (no RD search, no forward transform).
# ---------------------------------------------------------------------------


class _BoolEnc:
    def __init__(self):
        self.range = 255
        self.bottom = 0
        self.bit_count = 24
        self.out = bytearray()

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            if self.bottom & (1 << 31):  # carry
                i = len(self.out) - 1
                while self.out[i] == 0xFF:
                    self.out[i] = 0
                    i -= 1
                self.out[i] += 1
                self.bottom &= 0x7FFFFFFF
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.range <<= 1
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def literal(self, v: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.put((v >> i) & 1, 128)

    def flush(self) -> bytes:
        for _ in range(40):
            self.put(0, 128)
        return bytes(self.out)


def _put_tree(enc, tree, probs, leaf):
    """Emit the bit path for ``leaf`` through ``tree`` (leaves stored
    negated, matching _BoolDec.tree)."""
    # find path by DFS
    path = []

    def walk(i, acc):
        for b in (0, 1):
            t = tree[i + b]
            if t <= 0:
                if -t == leaf:
                    path.extend(acc + [(i >> 1, b)])
                    return True
            else:
                if walk(t, acc + [(i >> 1, b)]):
                    return True
        return False

    if not walk(0, []):
        raise ValueError(f"leaf {leaf} not in tree")
    for node, b in path:
        enc.put(b, probs[node])


def _put_coeffs(enc, plane_probs, ctx, first, coeffs):
    """Encode one block's quantizer-UNSCALED coefficient levels
    (natural order ints) as DCT tokens.  Returns nz flag."""
    # natural -> zigzag positions
    levels = [coeffs[ZIGZAG[i]] for i in range(16)]
    last = -1
    for i in range(first, 16):
        if levels[i]:
            last = i
    n = first
    check_eob = True
    while n < 16:
        probs = plane_probs[COEFF_BANDS[n]][ctx]
        if n > last:
            if check_eob:
                enc.put(0, probs[0])  # EOB
            break
        v = levels[n]
        if check_eob:
            enc.put(1, probs[0])
        if v == 0:
            enc.put(0, probs[1])
            ctx = 0
            check_eob = False
            n += 1
            continue
        enc.put(1, probs[1])
        check_eob = True
        av = abs(v)
        if av == 1:
            enc.put(0, probs[2])
            ctx = 1
        else:
            enc.put(1, probs[2])
            ctx = 2
            if av <= 4:
                enc.put(0, probs[3])
                if av == 2:
                    enc.put(0, probs[4])
                else:
                    enc.put(1, probs[4])
                    enc.put(av - 3, probs[5])
            else:
                enc.put(1, probs[3])
                # category containing av
                cat = 0
                while cat < 5 and av >= CAT_BASES[cat + 1]:
                    cat += 1
                if cat < 2:
                    enc.put(0, probs[6])
                    enc.put(cat, probs[7])
                else:
                    enc.put(1, probs[6])
                    if cat < 4:
                        enc.put(0, probs[8])
                        enc.put(cat - 2, probs[9])
                    else:
                        enc.put(1, probs[8])
                        enc.put(cat - 4, probs[10])
                extra = av - CAT_BASES[cat]
                cp = CAT_PROBS[cat]
                for i in range(len(cp) - 1, -1, -1):
                    enc.put((extra >> i) & 1, cp[len(cp) - 1 - i])
        enc.put(1 if v < 0 else 0, 128)
        n += 1
    return 1 if last >= first else 0


class MBSpec:
    """Explicit macroblock content for the stream writer.

    ymode: 0=DC 1=V 2=H 3=TM 4=B_PRED;  submodes: 16 local bmode ids
    (only for B_PRED);  uvmode: 0..3;  y/uv/y2 coeff blocks are
    quantizer-unscaled integer levels in natural (row-major) order.
    """

    def __init__(self, ymode=0, submodes=None, uvmode=0,
                 y_blocks=None, uv_blocks=None, y2_block=None):
        self.ymode = ymode
        self.submodes = submodes or [0] * 16
        self.uvmode = uvmode
        self.y_blocks = y_blocks or [[0] * 16 for _ in range(16)]
        self.uv_blocks = uv_blocks or [[0] * 16 for _ in range(8)]
        self.y2_block = y2_block or [0] * 16


def encode_vp8_stream(w: int, h: int, mbs, qi: int = 4) -> bytes:
    """Write a conformant single-partition key-frame stream from explicit
    MBSpec content (loop filter off, no segmentation, no prob updates)."""
    mb_w = (w + 15) >> 4
    mb_h = (h + 15) >> 4
    assert len(mbs) == mb_w * mb_h

    hdr = _BoolEnc()
    hdr.put(0, 128)  # color space
    hdr.put(0, 128)  # clamping
    hdr.put(0, 128)  # segmentation off
    hdr.put(0, 128)  # filter type
    hdr.literal(0, 6)  # filter level
    hdr.literal(0, 3)  # sharpness
    hdr.put(0, 128)  # lf adj off
    hdr.literal(0, 2)  # 1 token partition
    hdr.literal(qi, 7)  # y_ac_qi
    for _ in range(5):
        hdr.put(0, 128)  # no quant deltas
    hdr.put(0, 128)  # refresh entropy
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    hdr.put(0, COEFF_UPDATE_PROBS[t][b][c][p])
    hdr.put(0, 128)  # mb_no_coeff_skip off

    tok = _BoolEnc()
    above_nz = [[0] * 9 for _ in range(mb_w)]
    above_bmodes = [[0] * 4 for _ in range(mb_w)]
    for mb_y in range(mb_h):
        left_nz = [0] * 9
        left_bmodes = [0] * 4
        for mb_x in range(mb_w):
            spec = mbs[mb_y * mb_w + mb_x]
            is_b = spec.ymode == 4
            _put_tree(hdr, _KF_YMODE_TREE, KF_YMODE_PROBS, spec.ymode)
            if is_b:
                bsub = [[0] * 4 for _ in range(4)]
                for sy in range(4):
                    for sx in range(4):
                        above_m = above_bmodes[mb_x][sx] if sy == 0 else bsub[sy - 1][sx]
                        left_m = left_bmodes[sy] if sx == 0 else bsub[sy][sx - 1]
                        local = spec.submodes[sy * 4 + sx]
                        _put_tree(hdr, _BMODE_TREE,
                                  KF_BMODE_PROBS[above_m][left_m], local)
                        bsub[sy][sx] = _TO_SPEC[local]
                above_bmodes[mb_x] = bsub[3][:]
                left_bmodes = [bsub[r][3] for r in range(4)]
            else:
                sb = _MB_TO_SPEC_B[spec.ymode]
                above_bmodes[mb_x] = [sb] * 4
                left_bmodes = [sb] * 4
            _put_tree(hdr, _UV_MODE_TREE, KF_UV_MODE_PROBS, spec.uvmode)

            # tokens
            if not is_b:
                ctx = left_nz[8] + above_nz[mb_x][8]
                nz = _put_coeffs(tok, COEFF_PROBS[1], ctx, 0, spec.y2_block)
                left_nz[8] = above_nz[mb_x][8] = nz
                plane = COEFF_PROBS[0]
                first = 1
            else:
                plane = COEFF_PROBS[3]
                first = 0
            for sy in range(4):
                for sx in range(4):
                    ctx = left_nz[sy] + above_nz[mb_x][sx]
                    nz = _put_coeffs(tok, plane, ctx, first,
                                     spec.y_blocks[sy * 4 + sx])
                    left_nz[sy] = above_nz[mb_x][sx] = nz
            for pl in range(2):
                for sy in range(2):
                    for sx in range(2):
                        ctx = (left_nz[4 + 2 * pl + sy]
                               + above_nz[mb_x][4 + 2 * pl + sx])
                        nz = _put_coeffs(tok, COEFF_PROBS[2], ctx, 0,
                                         spec.uv_blocks[pl * 4 + sy * 2 + sx])
                        left_nz[4 + 2 * pl + sy] = nz
                        above_nz[mb_x][4 + 2 * pl + sx] = nz

    part0 = hdr.flush()
    part1 = tok.flush()
    tag = (len(part0) << 5) | (1 << 4) | 0  # keyframe, show, version 0
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a"
    head += bytes([w & 0xFF, (w >> 8) & 0x3F])
    head += bytes([h & 0xFF, (h >> 8) & 0x3F])
    return head + part0 + part1


def wrap_webp(vp8_payload: bytes) -> bytes:
    """RIFF/WEBP container around a raw VP8 key-frame stream."""
    ln = len(vp8_payload)
    chunk = b"VP8 " + _struct.pack("<I", ln) + vp8_payload + (b"\x00" if ln & 1 else b"")
    return b"RIFF" + _struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
