"""JPEG arithmetic entropy coding (ITU-T T.81 Annex D + §F.1.4/F.2.4,
progressive per §G.1.3/G.2) — pure Python/numpy, no external codecs.

This module supplies the entropy stage for SOF9 (extended sequential,
arithmetic) and SOF10 (progressive, arithmetic) frames; the DCT/
quantization/assembly machinery is shared with the Huffman path in
``jpeg.py``.  Conformance is pinned two ways by tests/test_jpeg_arith.py:
our decoder against libjpeg-encoded streams, and libjpeg's decoder
against our encoder's streams (via the tools/jpegref.c harness when a C
toolchain is present), plus pure round-trips that always run.

Reference-parity note (hQuery): the reference engine treats images as
opaque ``media_ref`` attributes (src extraction only —
/root/reference/src/hQuery/HTML_Index.php:617-640); pixel decode is part
of this repo's beyond-reference multimodal surface.

Coder registers follow the interval convention of T.81 §D: the interval
width A lives in [0x8000, 0x10000) between renormalizations, the MPS
sub-interval sits at the bottom, and conditional exchange applies when
the MPS width falls below Qe.  The probability state machine is Table
D.3 verbatim (113 adaptive states + the non-adaptive "fixed" state 113
used for sign decisions).
"""
from __future__ import annotations

from typing import Optional

# T.81 Table D.3: (Qe, NMPS, NLPS, SWITCH).  Row 113 is the fixed
# (non-adaptive) state: Qe ≈ 0.5, both successors self-loop.
ARITH_STATE_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

_FIXED = 113  # non-adaptive state for sign decisions (§F.1.4.4.1.1)

# Default conditioning when no DAC marker is present (T.81 §F.1.4.4.1.4
# and §F.1.4.4.2.1): DC L=0, U=1; AC Kx=5.
DEFAULT_DC_COND = (0, 1)
DEFAULT_AC_COND = 5

DC_STAT_BINS = 49   # 5 contexts × 4 + X1..X15 + 14 magnitude bins
AC_STAT_BINS = 245  # 63 × 3 + 2 × (14 X bins + 14 magnitude bins)


class ArithDecoder:
    """T.81 §F.2.2 arithmetic decoder over one entropy-coded segment.

    Statistics bins are one byte each: low 7 bits = Table D.3 state
    index, high bit = current MPS sense.  Hitting any marker latches the
    reader into zero-feed mode (legal mid-segment per §F.2.2.2 — the
    tail of the code stream is implicit zeros); ``pos`` then points at
    the marker's 0xFF so the caller can locate RSTn / scan end.
    """

    __slots__ = ("data", "n", "pos", "hit", "a", "c", "buf", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.n = len(data)
        self.restart_at(pos)

    def restart_at(self, pos: int) -> None:
        self.pos = pos
        self.hit = False
        self.buf = 0
        self.nbits = 0
        self.a = 0x10000
        b0 = self._byte()
        b1 = self._byte()
        self.c = (b0 << 8) | b1  # code window at the same scale as A

    def _byte(self) -> int:
        if self.hit:
            return 0
        pos, data, n = self.pos, self.data, self.n
        if pos >= n:
            self.hit = True
            return 0
        b = data[pos]
        if b != 0xFF:
            self.pos = pos + 1
            return b
        # 0xFF: swallow fill bytes, then stuffed-zero vs marker
        q = pos + 1
        while q < n and data[q] == 0xFF:
            q += 1
        if q < n and data[q] == 0x00:
            self.pos = q + 1
            return 0xFF
        self.hit = True  # marker (or EOF): zero-feed from here on
        return 0

    def _bit(self) -> int:
        if self.nbits == 0:
            self.buf = self._byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def decode(self, stats: bytearray, i: int) -> int:
        sv = stats[i]
        idx = sv & 0x7F
        mps = sv >> 7
        qe, nmps, nlps, sw = ARITH_STATE_TABLE[idx]
        a = self.a - qe
        if self.c < a:
            if a >= 0x8000:
                self.a = a
                return mps
            # MPS renorm path; conditional exchange if MPS width < Qe
            if a < qe:
                bit = 1 - mps
                stats[i] = nlps | ((mps ^ sw) << 7)
            else:
                bit = mps
                stats[i] = nmps | (mps << 7)
        else:
            self.c -= a
            if a < qe:  # conditional exchange: this region is the MPS
                bit = mps
                stats[i] = nmps | (mps << 7)
            else:
                bit = 1 - mps
                stats[i] = nlps | ((mps ^ sw) << 7)
            a = qe
        while a < 0x8000:
            a <<= 1
            self.c = (self.c << 1) | self._bit()
        self.a = a
        return bit

    def decode_fixed(self) -> int:
        """One bit with the non-adaptive 50/50 state (sign decisions)."""
        qe = 0x5A1D
        a = self.a - qe
        if self.c < a:
            bit = 0 if a >= 0x8000 else (1 if a < qe else 0)
        else:
            self.c -= a
            bit = 0 if a < qe else 1
            a = qe
        while a < 0x8000:
            a <<= 1
            self.c = (self.c << 1) | self._bit()
        self.a = a
        return bit


class ArithEncoder:
    """T.81 §D.1 arithmetic encoder (byte-stuffing + carry stack)."""

    __slots__ = ("a", "c", "ct", "out", "buffer", "sc")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.out = bytearray()
        self.buffer = -1  # no byte pending yet
        self.sc = 0       # stacked 0xFF bytes awaiting carry resolution

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)  # §D.1.6 byte stuffing

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry: bumps the pending byte, turns stacked FFs into 00s
            self._emit(self.buffer + 1)
            for _ in range(self.sc):
                self.out.append(0x00)
            self.sc = 0
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1  # defer — a later carry may still change it
        else:
            if self.buffer >= 0:
                self._emit(self.buffer)
            for _ in range(self.sc):
                self._emit(0xFF)
            self.sc = 0
            self.buffer = t
        self.c &= 0x7FFFF
        self.ct = 8

    def _renorm(self) -> None:
        a, c, ct = self.a, self.c, self.ct
        while a < 0x8000:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                self.c = c
                self.ct = 0
                self._byteout()
                c = self.c
                ct = self.ct
        self.a, self.c, self.ct = a, c, ct

    def encode(self, stats: bytearray, i: int, bit: int) -> None:
        sv = stats[i]
        idx = sv & 0x7F
        mps = sv >> 7
        qe, nmps, nlps, sw = ARITH_STATE_TABLE[idx]
        a = self.a - qe
        if bit == mps:
            if a >= 0x8000:
                self.a = a
                return
            if a < qe:  # conditional exchange: MPS takes the Qe interval
                self.c += a
                a = qe
            stats[i] = nmps | (mps << 7)
        else:
            if a < qe:  # conditional exchange: LPS takes the bottom
                pass  # C unchanged, A = a
            else:
                self.c += a
                a = qe
            stats[i] = nlps | ((mps ^ sw) << 7)
        self.a = a
        self._renorm()

    def encode_fixed(self, bit: int) -> None:
        qe = 0x5A1D
        a = self.a - qe
        if bit == 0:
            if a >= 0x8000:
                self.a = a
                return
            if a < qe:
                self.c += a
                a = qe
        else:
            if a >= qe:
                self.c += a
                a = qe
        self.a = a
        self._renorm()

    def flush(self) -> bytes:
        """§D.1.8/D.1.9: CLEARBITS + FINALWRITES; returns the segment."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = (t + 0x8000) if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.buffer >= 0:
            self._emit(self.buffer)
        for _ in range(self.sc):
            self._emit(0xFF)
        self.buffer = -1
        self.sc = 0
        # trailing zero bytes carry no information (§D.1.9) — trim, but
        # never past a stuffing pair's 0xFF.
        out = self.out
        while out and out[-1] == 0x00 and not (len(out) >= 2 and out[-2] == 0xFF):
            out.pop()
        return bytes(out)


# ------------------------------------------------------------------ #
# Scan-level procedures.  ``stats`` dicts are per-table-id bytearrays,
# reset at every scan start and at restart markers (§F.1.4.4 / §F.2.4).


def new_dc_stats() -> bytearray:
    return bytearray(DC_STAT_BINS)


def new_ac_stats() -> bytearray:
    return bytearray(AC_STAT_BINS)


def decode_dc_diff(dec, stats: bytearray, ctx: list, si: int, L: int, U: int) -> int:
    """§F.2.4.1: one DC difference; ``ctx[si]`` is the conditioning
    context (0/4/8/12/16) carried between blocks of the component."""
    st = ctx[si]
    if dec.decode(stats, st) == 0:
        ctx[si] = 0
        return 0
    sign = dec.decode(stats, st + 1)
    sp = st + 2 + sign
    m = dec.decode(stats, sp)
    if m:
        sp = 20  # X1
        while dec.decode(stats, sp):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arith DC magnitude overflow")
            sp += 1
    # conditioning classification for the NEXT block (§F.1.4.4.1.2)
    if m < (1 << L) >> 1:
        ctx[si] = 0
    elif m > (1 << U) >> 1:
        ctx[si] = 12 + (sign << 2)
    else:
        ctx[si] = 4 + (sign << 2)
    v = m
    stm = sp + 14
    mm = m >> 1
    while mm:
        if dec.decode(stats, stm):
            v |= mm
        mm >>= 1
    v += 1
    return -v if sign else v


def encode_dc_diff(enc, stats: bytearray, ctx: list, si: int,
                   diff: int, L: int, U: int) -> None:
    st = ctx[si]
    if diff == 0:
        enc.encode(stats, st, 0)
        ctx[si] = 0
        return
    enc.encode(stats, st, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, st + 1, sign)
    v = (-diff if sign else diff) - 1
    sp = st + 2 + sign
    if v == 0:
        enc.encode(stats, sp, 0)
        m = 0
    else:
        enc.encode(stats, sp, 1)
        m = 1
        sp = 20
        while v >= (m << 1):
            enc.encode(stats, sp, 1)
            m <<= 1
            sp += 1
        enc.encode(stats, sp, 0)
    if m < (1 << L) >> 1:
        ctx[si] = 0
    elif m > (1 << U) >> 1:
        ctx[si] = 12 + (sign << 2)
    else:
        ctx[si] = 4 + (sign << 2)
    stm = sp + 14
    mm = m >> 1
    while mm:
        enc.encode(stats, stm, 1 if v & mm else 0)
        mm >>= 1


def decode_ac_coefs(dec, stats: bytearray, blk, zigzag, kx: int,
                    ss: int = 1, se: int = 63, al: int = 0) -> None:
    """§F.2.4.2 (sequential) / §G.2.3 (progressive first pass when
    ``al`` > 0): AC coefficients of one block in k ∈ [ss, se]."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):
            return  # EOB
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("arith AC run overflow")
        sign = dec.decode_fixed()
        st += 2
        m = dec.decode(stats, st)
        if m and dec.decode(stats, st):
            m = 2
            st = 189 if k <= kx else 217
            while dec.decode(stats, st):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arith AC magnitude overflow")
                st += 1
        v = m
        stm = st + 14
        mm = m >> 1
        while mm:
            if dec.decode(stats, stm):
                v |= mm
            mm >>= 1
        v += 1
        blk[zigzag[k]] = (-v if sign else v) << al
        k += 1


def encode_ac_coefs(enc, stats: bytearray, zzvals, kx: int,
                    ss: int = 1, se: int = 63, al: int = 0) -> None:
    """Encoder twin of ``decode_ac_coefs``; ``zzvals`` are the block's
    coefficients in zigzag order (full precision — the point transform
    ``al`` is applied here)."""
    # magnitudes in the shifted domain, sign preserved
    ke = se
    while ke >= ss and (abs(int(zzvals[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)  # not EOB
        v = int(zzvals[k])
        a = abs(v) >> al
        while a == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
            v = int(zzvals[k])
            a = abs(v) >> al
        enc.encode(stats, st + 1, 1)
        enc.encode_fixed(1 if v < 0 else 0)
        st += 2
        a -= 1
        if a == 0:
            enc.encode(stats, st, 0)
            m = 0
        else:
            enc.encode(stats, st, 1)
            if a == 1:
                enc.encode(stats, st, 0)
                m = 1
            else:
                enc.encode(stats, st, 1)
                m = 2
                st = 189 if k <= kx else 217
                while a >= (m << 1):
                    enc.encode(stats, st, 1)
                    m <<= 1
                    st += 1
                enc.encode(stats, st, 0)
        stm = st + 14
        mm = m >> 1
        while mm:
            enc.encode(stats, stm, 1 if a & mm else 0)
            mm >>= 1
        k += 1
    if k <= se:
        enc.encode(stats, 3 * (k - 1), 1)  # EOB


def decode_dc_refine(dec, blk, al: int) -> None:
    """§G.2.2 DC successive-approximation refinement: one fixed bit."""
    if dec.decode_fixed():
        blk[0] |= 1 << al


def encode_dc_refine(enc, dc: int, al: int) -> None:
    # DC point transform is an ARITHMETIC shift (§G.1.2.1) — Python's
    # >> on negative ints matches two's-complement floor semantics.
    enc.encode_fixed((int(dc) >> al) & 1)


def decode_ac_refine(dec, stats: bytearray, blk, zigzag,
                     ss: int, se: int, al: int) -> None:
    """§G.2.3 AC refinement scan for one block."""
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex > 0 and blk[zigzag[kex]] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(stats, st):
                return  # EOB
        while True:
            z = zigzag[k]
            cur = blk[z]
            if cur:
                if dec.decode(stats, st + 2):
                    blk[z] = cur + (m1 if cur < 0 else p1)
                break
            if dec.decode(stats, st + 1):
                blk[z] = m1 if dec.decode_fixed() else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("arith AC refine overflow")
        k += 1


def encode_ac_refine(enc, stats: bytearray, zzvals,
                     ss: int, se: int, ah: int, al: int) -> None:
    """Encoder twin of ``decode_ac_refine`` over full-precision zigzag
    coefficients; Ah = Al + 1 is the previous scan's point transform."""
    ke = se
    while ke >= ss and (abs(int(zzvals[ke])) >> al) == 0:
        ke -= 1
    kex = ke
    while kex >= ss and (abs(int(zzvals[kex])) >> ah) == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if k > ke:
                enc.encode(stats, st, 1)  # EOB
                return
            enc.encode(stats, st, 0)
        while True:
            v = int(zzvals[k])
            a = abs(v)
            if a >> ah:  # previously nonzero → correction bit
                enc.encode(stats, st + 2, (a >> al) & 1)
                break
            if a >> al:  # newly significant (±1 in the shifted domain)
                enc.encode(stats, st + 1, 1)
                enc.encode_fixed(1 if v < 0 else 0)
                break
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
            if k > se:
                raise ValueError("arith AC refine encode overflow")
        k += 1


def find_rst_marker(payload: bytes, pos: int) -> Optional[int]:
    """Scan forward for the next marker; return its position if it is
    RSTn, else None (restart expected but something else found)."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        m = payload[pos + 1]
        if m == 0x00 or m == 0xFF:
            pos += 1 if m == 0xFF else 2
            continue
        return pos if 0xD0 <= m <= 0xD7 else None
    return None
