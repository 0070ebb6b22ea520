"""Recover the normative VP8 (RFC 6386) constant tables from the system
libwebp binary and emit ``hquery_php_spark/operators/vp8_tables.py``.

The VP8 bitstream format is a public normative spec (RFC 6386); its
default probability / quantizer tables are normative constants.  This
container has no network and no VP8 source tree, but it does ship
``libwebp.so`` — whose ``.rodata`` carries exactly those constants.  This
script locates them by structural anchors (monotonic quantizer lookups,
the well-known first row of the key-frame B-mode probabilities, the
zig-zag order) and regenerates the tables module.  The decoder's
conformance tests (tests/test_vp8_conformance.py) then verify the
recovered tables *functionally*: pure-Python decode must be bit-exact
with libwebp's decode on libwebp-encoded streams.

Layout facts used (verified against the dump, see offsets below):
  kAcTable   : 128 x uint16, non-decreasing, 4..284
  kDcTable   : 128 x uint8,  non-decreasing, 4..157, directly after
  kBands     : 17 bytes {0,1,2,3,6,4,5,6,...,7,0}, directly after
  CoeffsUpdateProba : 1056 bytes (4x8x3x11), 255-dominated, ends right
                      at the kBModesProba anchor
  kBModesProba      : 900 bytes (10x10x9), first row
                      {231,120,48,89,115,113,120,152,112}
  CoeffsProba0      : 1056 bytes (4x8x3x11), first 28-byte-aligned
                      block after kBModesProba, opening with the
                      all-128 (unused) luma-AC band-0 rows

Usage:  python tools/extract_vp8_tables.py [path-to-libwebp.so]
"""

from __future__ import annotations

import ctypes.util
import re
import struct
import sys
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "hquery_php_spark" / "operators" / "vp8_tables.py"

BMODE_ANCHOR = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
KBANDS = bytes([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7])
ZIGZAG = bytes([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])


def find_lib() -> str:
    if len(sys.argv) > 1:
        return sys.argv[1]
    for cand in (
        "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
        "/usr/lib/x86_64-linux-gnu/libwebp.so",
    ):
        if Path(cand).exists():
            return str(Path(cand).resolve())
    path = ctypes.util.find_library("webp")
    if not path:
        raise SystemExit("libwebp not found")
    return path


def main() -> None:
    lib = find_lib()
    data = Path(lib).read_bytes()

    # -- quantizer lookups: AC is 128 non-decreasing uint16 ending 284
    ac_off = None
    for off in range(0, len(data) - 256, 2):
        if data[off : off + 2] != b"\x04\x00":
            continue
        vals = struct.unpack_from("<128H", data, off)
        if (
            vals[:5] == (4, 5, 6, 7, 8)
            and all(vals[i] <= vals[i + 1] for i in range(127))
            and vals[-1] == 284
        ):
            ac_off = off
            break
    assert ac_off is not None, "kAcTable not found"
    ac = list(struct.unpack_from("<128H", data, ac_off))

    dc_off = ac_off + 256  # kDcTable (uint8) directly follows
    dc = list(data[dc_off : dc_off + 128])
    assert dc[0] == 4 and dc[-1] == 157 and all(
        dc[i] <= dc[i + 1] for i in range(127)
    ), "kDcTable not where expected"
    assert data[dc_off + 128 : dc_off + 144] == KBANDS, "kBands not adjacent"

    # -- kBModesProba by its well-known first row; update probs end there
    bm_off = data.index(BMODE_ANCHOR)
    bmode = [
        [list(data[bm_off + (i * 10 + j) * 9 : bm_off + (i * 10 + j) * 9 + 9]) for j in range(10)]
        for i in range(10)
    ]
    upd_off = bm_off - 1056
    upd = data[upd_off : upd_off + 1056]
    assert upd.count(255) > 800 and 0 not in upd, "CoeffsUpdateProba shape off"

    # -- CoeffsProba0: first aligned block after kBModesProba whose
    #    opening 33 bytes are the unused all-128 band
    cp_off = None
    for off in range(bm_off + 900, bm_off + 2000):
        if data[off : off + 33] == b"\x80" * 33 and data[off - 1] != 0x80:
            cp_off = off
            break
    assert cp_off is not None, "CoeffsProba0 not found"
    cp = data[cp_off : cp_off + 1056]
    assert 0 not in cp, "coeff probs must be 1..255"

    def quad(b: bytes):
        # [4][8][3][11] nested lists from 1056 flat bytes
        it = iter(b)
        return [
            [[[next(it) for _ in range(11)] for _ in range(3)] for _ in range(8)]
            for _ in range(4)
        ]

    body = f'''"""Normative VP8 (RFC 6386) constant tables.

These are the public, normative default-probability and quantizer
tables of the VP8 still-image/key-frame bitstream (RFC 6386 sections
11.2, 13.4, 13.5, 14.1) as used by lossy WebP.  They were recovered
from the system reference implementation's binary (libwebp, offsets
below) by tools/extract_vp8_tables.py because this container carries
no VP8 source text, and are verified FUNCTIONALLY by
tests/test_vp8_conformance.py: the pure-Python decoder built on them
must produce bit-exact YUV output vs libwebp's decoder on streams from
libwebp's encoder.  Regenerate with:

    python tools/extract_vp8_tables.py

Source binary : {lib}
  kAcTable          @ {ac_off}
  kDcTable          @ {dc_off}
  CoeffsUpdateProba @ {upd_off}
  kBModesProba      @ {bm_off}
  CoeffsProba0      @ {cp_off}
"""

# quantizer lookups (RFC 6386 14.1), index 0..127
AC_QLOOKUP = {ac!r}

DC_QLOOKUP = {dc!r}

# coefficient-band map for coefficient positions 0..15 (RFC 6386 13.3)
COEFF_BANDS = {list(KBANDS)!r}

# zig-zag scan order (RFC 6386 13.5)
ZIGZAG = {list(ZIGZAG)!r}

# default token probabilities [plane 4][band 8][ctx 3][node 11]
# plane order: 0 = Y-after-Y2 (first coeff 1), 1 = Y2, 2 = chroma,
# 3 = Y-without-Y2 (B_PRED macroblocks)  (RFC 6386 13.4)
COEFF_PROBS = {quad(cp)!r}

# probabilities governing per-frame token-probability updates
# (same shape/plane order; RFC 6386 13.4)
COEFF_UPDATE_PROBS = {quad(upd)!r}

# key-frame intra 4x4 sub-block mode probabilities,
# [above mode 10][left mode 10][tree node 9] (RFC 6386 11.5)
KF_BMODE_PROBS = {bmode!r}

# key-frame 16x16 luma / chroma mode probabilities (RFC 6386 11.2)
KF_YMODE_PROBS = [145, 156, 163, 128]
KF_UV_MODE_PROBS = [142, 114, 183]

# DCT-token extra-bit probabilities for categories 1..6 (RFC 6386 13.2)
CAT_PROBS = [
    [159],
    [165, 145],
    [173, 148, 140],
    [176, 155, 140, 135],
    [180, 157, 141, 134, 130],
    [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
]
CAT_BASES = [5, 7, 11, 19, 35, 67]
'''
    OUT.write_text(body)
    print(f"wrote {OUT} (ac@{ac_off} dc@{dc_off} upd@{upd_off} bmode@{bm_off} coeff@{cp_off})")
    print("dc_qlookup[117] =", dc[117])


if __name__ == "__main__":
    main()
