"""Codec-configuration records: the per-sample-entry bytes an MP4/WebM
sample description carries for each codec — parsed AND written, with no
media library.

Why this exists at 100 TB: the container walk (``mediameta.py``) answers
"what tracks, what duration, what tkhd dims"; the codec-config records
answer the questions a curation pipeline actually filters on before it
pays for a decode — *which profile/level/bit depth*, and the exact coded
dimensions (tkhd dims are presentation hints; the SPS is authoritative).
The industry-standard filter key is the RFC 6381 codec string
(``avc1.64001F``, ``hev1.1.6.L93.B0``, ``av01.0.08M.08``,
``vp09.00.10.08``, ``mp4a.40.2``) — the same string HTML ``<source
type="...; codecs=...">`` and DASH/HLS manifests use, so extracted values
join directly against crawl-side capability tables.

Implemented from the public specs only:

* H.264/AVC  — ISO 14496-10 §7.3.2.1 seq_parameter_set_rbsp (Exp-Golomb
  bit reader/writer, RBSP emulation-prevention escape, full cropping and
  high-profile chroma/bit-depth/scaling-list syntax) and ISO 14496-15
  §5.3.3.1 AVCDecoderConfigurationRecord (``avcC``).
* H.265/HEVC — ISO 14496-15 §8.3.3.1 HEVCDecoderConfigurationRecord
  (``hvcC``) at record level; the SPS bitstream inside the arrays is an
  honest boundary (no HEVC bitstream parser in-repo).
* AV1 — AV1-ISOBMFF ``av1C`` (AV1CodecConfigurationRecord) and the AV1
  bitstream spec §5.5 sequence_header_obu — profile, levels/tiers per
  operating point, max frame dims — validated against real libavif/libaom
  output in tests/test_codecconfig.py.
* VP9 — VP Codec ISO Media File Format Binding ``vpcC``.
* AAC — ISO 14496-1 §7.2.6 ES_Descriptor/DecoderConfigDescriptor inside
  ``esds`` + ISO 14496-3 §1.6.2.1 AudioSpecificConfig.
* Opus — Opus-in-ISOBMFF ``dOps`` (OpusSpecificBox).

Reference parity note: the reference engine (duzun/hQuery.php) sniffs
content types before fetching bodies (hQuery.php:136-226); this module
extends the same filter-before-work doctrine one level deeper than the
container walk.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

__all__ = [
    "BitReader",
    "BitWriter",
    "rbsp_escape",
    "rbsp_unescape",
    "build_avc_sps",
    "parse_avc_sps",
    "build_avc_pps",
    "build_avcc",
    "parse_avcc",
    "build_hvcc",
    "parse_hvcc",
    "build_hevc_sps",
    "parse_hevc_sps",
    "build_av1c",
    "parse_av1c",
    "build_av1_seq_header_obu",
    "parse_av1_seq_header_obu",
    "build_vpcc",
    "parse_vpcc",
    "build_esds",
    "parse_esds",
    "build_dops",
    "parse_dops",
    "build_opus_head",
    "parse_opus_head",
    "build_vp9_codec_private",
    "parse_vp9_codec_private",
    "codec_string",
    "AAC_FREQ_TABLE",
]


# ------------------------------------------------------------------ #
# Bit I/O + Exp-Golomb (ISO 14496-10 §9.1)


class BitWriter:
    """MSB-first bit assembler with unsigned/signed Exp-Golomb."""

    def __init__(self) -> None:
        self._bits: List[int] = []

    def u(self, value: int, n: int) -> "BitWriter":
        if value < 0 or (n < 64 and value >> n):
            raise ValueError(f"u({n}) out of range: {value}")
        for i in range(n - 1, -1, -1):
            self._bits.append((value >> i) & 1)
        return self

    def ue(self, value: int) -> "BitWriter":
        # codeNum -> [M zeros][1][M info bits] with M = floor(log2(v+1))
        v = value + 1
        m = v.bit_length() - 1
        return self.u(v, 2 * m + 1)

    def se(self, value: int) -> "BitWriter":
        # 14496-10 §9.1.1: k>0 -> 2k-1, k<=0 -> -2k
        return self.ue(2 * value - 1 if value > 0 else -2 * value)

    def leb128(self, value: int) -> "BitWriter":
        # AV1 §4.10.5 (byte-aligned caller responsibility)
        while True:
            byte = value & 0x7F
            value >>= 7
            self.u(byte | (0x80 if value else 0), 8)
            if not value:
                return self

    def uvlc(self, value: int) -> "BitWriter":
        # AV1 §4.10.3 — same code as ue()
        return self.ue(value)

    def rbsp_trailing(self) -> "BitWriter":
        self.u(1, 1)
        while len(self._bits) % 8:
            self.u(0, 1)
        return self

    def byte_align(self) -> "BitWriter":
        while len(self._bits) % 8:
            self.u(0, 1)
        return self

    def bytes(self) -> bytes:
        if len(self._bits) % 8:
            raise ValueError("not byte aligned")
        out = bytearray()
        acc = 0
        for i, b in enumerate(self._bits):
            acc = (acc << 1) | b
            if i % 8 == 7:
                out.append(acc)
                acc = 0
        return bytes(out)


class BitReader:
    """MSB-first bit reader with Exp-Golomb; raises ValueError past end."""

    def __init__(self, data: bytes) -> None:
        self._d = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self._d):
                raise ValueError("bitstream exhausted")
            v = (v << 1) | ((self._d[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("Exp-Golomb code too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def uvlc(self) -> int:
        return self.ue()

    def leb128(self) -> int:
        v = 0
        for i in range(8):
            byte = self.u(8)
            v |= (byte & 0x7F) << (7 * i)
            if not byte & 0x80:
                return v
        raise ValueError("leb128 too long")


def rbsp_escape(raw: bytes) -> bytes:
    """Insert emulation-prevention bytes: 00 00 {00,01,02,03} ->
    00 00 03 xx (ISO 14496-10 §7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in raw:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def rbsp_unescape(nal_payload: bytes) -> bytes:
    """Drop emulation-prevention 03 bytes (00 00 03 -> 00 00)."""
    out = bytearray()
    zeros = 0
    i = 0
    n = len(nal_payload)
    while i < n:
        b = nal_payload[i]
        if zeros >= 2 and b == 3 and i + 1 < n and nal_payload[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


# ------------------------------------------------------------------ #
# H.264 / AVC (ISO 14496-10 §7.3.2.1)

# profiles whose SPS carries the chroma/bit-depth/scaling block
_AVC_HIGH_PROFILES = frozenset(
    (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
)


def build_avc_sps(
    width: int,
    height: int,
    profile_idc: int = 66,
    level_idc: int = 30,
    constraint_flags: int = 0,
    frame_mbs_only: bool = True,
) -> bytes:
    """A complete SPS NAL unit (header byte + escaped RBSP) encoding the
    EXACT ``width`` x ``height`` via frame cropping.  High profiles get
    the 4:2:0/8-bit chroma block; interlaced (``frame_mbs_only=False``)
    doubles the map-unit height granularity."""
    if width < 1 or height < 1 or width % 2 or height % 2:
        # crop units are 2 px in 4:2:0 — odd dims are not representable
        raise ValueError("dimensions must be positive and even")
    w = BitWriter()
    w.u(profile_idc, 8)
    w.u(constraint_flags, 8)
    w.u(level_idc, 8)
    w.ue(0)  # seq_parameter_set_id
    if profile_idc in _AVC_HIGH_PROFILES:
        w.ue(1)  # chroma_format_idc = 4:2:0
        w.ue(0).ue(0)  # bit_depth_{luma,chroma}_minus8
        w.u(0, 1)  # qpprime_y_zero_transform_bypass_flag
        w.u(0, 1)  # seq_scaling_matrix_present_flag
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type -> 0
    w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    mbs_w = (width + 15) // 16
    unit_h = 16 if frame_mbs_only else 32
    units_h = (height + unit_h - 1) // unit_h
    w.ue(mbs_w - 1)  # pic_width_in_mbs_minus1
    w.ue(units_h - 1)  # pic_height_in_map_units_minus1
    w.u(1 if frame_mbs_only else 0, 1)
    if not frame_mbs_only:
        w.u(0, 1)  # mb_adaptive_frame_field_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    crop_r = (mbs_w * 16 - width) // 2  # CropUnitX = 2 (4:2:0)
    crop_unit_y = 2 * (1 if frame_mbs_only else 2)
    crop_b = (units_h * unit_h - height) // crop_unit_y
    if crop_r or crop_b:
        w.u(1, 1)  # frame_cropping_flag
        w.ue(0).ue(crop_r).ue(0).ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    w.rbsp_trailing()
    # NAL header: forbidden 0, nal_ref_idc 3, nal_unit_type 7 (SPS)
    return b"\x67" + rbsp_escape(w.bytes())


def _skip_scaling_list(r: BitReader, size: int) -> None:
    last, nxt = 8, 8
    for _ in range(size):
        if nxt:
            nxt = (last + r.se() + 256) % 256
        if nxt:
            last = nxt


def parse_avc_sps(nal: bytes) -> Optional[dict]:
    """SPS NAL -> {'profile_idc','constraint_flags','level_idc','width',
    'height','chroma_format_idc','bit_depth_luma','frame_mbs_only'}, or
    None for a NAL that is not an SPS / truncated bits."""
    if not nal or nal[0] & 0x1F != 7:
        return None
    try:
        r = BitReader(rbsp_unescape(nal[1:]))
        profile = r.u(8)
        constraint = r.u(8)
        level = r.u(8)
        r.ue()  # sps id
        chroma, bd_luma = 1, 8
        if profile in _AVC_HIGH_PROFILES:
            chroma = r.ue()
            separate = r.u(1) if chroma == 3 else 0
            bd_luma = 8 + r.ue()
            r.ue()  # bit_depth_chroma_minus8
            r.u(1)  # qpprime_y_zero_transform_bypass_flag
            if r.u(1):  # seq_scaling_matrix_present_flag
                n_lists = 8 if chroma != 3 else 12
                for i in range(n_lists):
                    if r.u(1):
                        _skip_scaling_list(r, 16 if i < 6 else 64)
        else:
            separate = 0
        r.ue()  # log2_max_frame_num_minus4
        poc_type = r.ue()
        if poc_type == 0:
            r.ue()
        elif poc_type == 1:
            r.u(1)
            r.se()
            r.se()
            for _ in range(r.ue()):
                r.se()
        r.ue()  # max_num_ref_frames
        r.u(1)  # gaps_in_frame_num_value_allowed_flag
        mbs_w = r.ue() + 1
        units_h = r.ue() + 1
        frame_mbs_only = r.u(1)
        if not frame_mbs_only:
            r.u(1)
        r.u(1)  # direct_8x8_inference_flag
        crop_l = crop_r = crop_t = crop_b = 0
        if r.u(1):  # frame_cropping_flag
            crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
        # §7.4.2.1.1: crop units by chroma format (4:2:0 -> 2x2)
        if chroma == 0 or separate:
            cux, cuy = 1, 2 - frame_mbs_only
        elif chroma == 1:
            cux, cuy = 2, 2 * (2 - frame_mbs_only)
        elif chroma == 2:
            cux, cuy = 2, 2 - frame_mbs_only
        else:
            cux, cuy = 1, 2 - frame_mbs_only
        width = mbs_w * 16 - cux * (crop_l + crop_r)
        height = (2 - frame_mbs_only) * units_h * 16 - cuy * (crop_t + crop_b)
        return {
            "profile_idc": profile,
            "constraint_flags": constraint,
            "level_idc": level,
            "width": width,
            "height": height,
            "chroma_format_idc": chroma,
            "bit_depth_luma": bd_luma,
            "frame_mbs_only": bool(frame_mbs_only),
        }
    except ValueError:
        return None


def build_avc_pps() -> bytes:
    """A minimal valid PPS NAL (id 0 referencing SPS 0, CAVLC)."""
    w = BitWriter()
    w.ue(0).ue(0)  # pps id, sps id
    w.u(0, 1)  # entropy_coding_mode_flag (CAVLC)
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0).ue(0)  # num_ref_idx_l{0,1}_default_active_minus1
    w.u(0, 1)  # weighted_pred_flag
    w.u(0, 2)  # weighted_bipred_idc
    w.se(0).se(0).se(0)  # init_qp, init_qs, chroma_qp_index_offset
    w.u(1, 1)  # deblocking_filter_control_present_flag
    w.u(0, 1)  # constrained_intra_pred_flag
    w.u(0, 1)  # redundant_pic_cnt_present_flag
    w.rbsp_trailing()
    return b"\x68" + rbsp_escape(w.bytes())


def build_avcc(sps: bytes, pps: Optional[bytes] = None) -> bytes:
    """AVCDecoderConfigurationRecord (ISO 14496-15 §5.3.3.1) wrapping one
    SPS (+ one PPS, default-built when omitted)."""
    if pps is None:
        pps = build_avc_pps()
    return (
        bytes((1, sps[1], sps[2], sps[3], 0xFF, 0xE1))
        + struct.pack(">H", len(sps))
        + sps
        + b"\x01"
        + struct.pack(">H", len(pps))
        + pps
    )


def parse_avcc(body: bytes) -> Optional[dict]:
    """avcC record -> {'profile_idc','profile_compat','level_idc',
    'nal_length_size','sps':[...],'pps':[...], + parsed first-SPS fields
    ('width','height',... merged in when the SPS parses)}."""
    if len(body) < 7 or body[0] != 1:
        return None
    out = {
        "profile_idc": body[1],
        "profile_compat": body[2],
        "level_idc": body[3],
        "nal_length_size": (body[4] & 3) + 1,
        "sps": [],
        "pps": [],
    }
    try:
        pos = 5
        n_sps = body[pos] & 0x1F
        pos += 1
        for _ in range(n_sps):
            (ln,) = struct.unpack_from(">H", body, pos)
            pos += 2
            out["sps"].append(body[pos : pos + ln])
            pos += ln
        n_pps = body[pos]
        pos += 1
        for _ in range(n_pps):
            (ln,) = struct.unpack_from(">H", body, pos)
            pos += 2
            out["pps"].append(body[pos : pos + ln])
            pos += ln
    except struct.error:
        return None
    if out["sps"]:
        sps = parse_avc_sps(out["sps"][0])
        if sps:
            out.update(sps)
    return out


# ------------------------------------------------------------------ #
# H.265 / HEVC: record (ISO 14496-15 §8.3.3.1) + SPS bitstream
# (ISO 23008-2 / ITU-T H.265 §7.3.2.2.1)


def _write_ptl(w: BitWriter, profile_idc: int, tier: int, level_idc: int,
               compat_flags: int) -> None:
    # profile_tier_level(1, 0): general block only (no sub-layers)
    w.u(0, 2).u(tier, 1).u(profile_idc, 5)
    w.u(compat_flags, 32)
    # progressive=1, interlaced=0, non_packed=1, frame_only=1
    w.u(1, 1).u(0, 1).u(1, 1).u(1, 1)
    w.u(0, 43)  # general_reserved_zero_43bits
    w.u(0, 1)  # general_inbld_flag
    w.u(level_idc, 8)


def build_hevc_sps(
    width: int,
    height: int,
    profile_idc: int = 1,
    tier: int = 0,
    level_idc: int = 93,
    bit_depth: int = 8,
) -> bytes:
    """A complete, syntactically valid HEVC SPS NAL unit (2-byte NAL
    header + escaped RBSP) encoding the EXACT ``width`` x ``height``:
    luma dims are rounded up to the 8-sample MinCbSizeY grid and the
    remainder expressed through the conformance window, exactly as
    encoders do."""
    if width < 1 or height < 1 or width % 2 or height % 2:
        raise ValueError("dimensions must be positive and even")
    if profile_idc == 1:
        compat = 0x60000000
    elif profile_idc == 2:
        compat = 0x20000000
    else:
        compat = 1 << (31 - profile_idc)
    w = BitWriter()
    w.u(0, 4)  # sps_video_parameter_set_id
    w.u(0, 3)  # sps_max_sub_layers_minus1
    w.u(1, 1)  # sps_temporal_id_nesting_flag
    _write_ptl(w, profile_idc, tier, level_idc, compat)
    w.ue(0)  # sps_seq_parameter_set_id
    w.ue(1)  # chroma_format_idc = 4:2:0
    lw = (width + 7) & ~7  # MinCbSizeY = 8 grid
    lh = (height + 7) & ~7
    w.ue(lw)  # pic_width_in_luma_samples
    w.ue(lh)  # pic_height_in_luma_samples
    crop_r = (lw - width) // 2  # conformance offsets in chroma units
    crop_b = (lh - height) // 2
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0).ue(crop_r).ue(0).ue(crop_b)
    else:
        w.u(0, 1)
    w.ue(bit_depth - 8)  # bit_depth_luma_minus8
    w.ue(bit_depth - 8)  # bit_depth_chroma_minus8
    w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4
    w.u(0, 1)  # sps_sub_layer_ordering_info_present_flag
    w.ue(1).ue(0).ue(0)  # max_dec_pic_buffering_minus1/reorder/latency
    w.ue(0)  # log2_min_luma_coding_block_size_minus3 -> MinCbSizeY 8
    w.ue(3)  # log2_diff_max_min_luma_coding_block_size -> CTB 64
    w.ue(0)  # log2_min_luma_transform_block_size_minus2
    w.ue(3)  # log2_diff_max_min_luma_transform_block_size
    w.ue(0).ue(0)  # max_transform_hierarchy_depth_{inter,intra}
    w.u(0, 1)  # scaling_list_enabled_flag
    w.u(1, 1)  # amp_enabled_flag
    w.u(1, 1)  # sample_adaptive_offset_enabled_flag
    w.u(0, 1)  # pcm_enabled_flag
    w.ue(0)  # num_short_term_ref_pic_sets
    w.u(0, 1)  # long_term_ref_pics_present_flag
    w.u(1, 1)  # sps_temporal_mvp_enabled_flag
    w.u(1, 1)  # strong_intra_smoothing_enabled_flag
    w.u(0, 1)  # vui_parameters_present_flag
    w.u(0, 1)  # sps_extension_present_flag
    w.rbsp_trailing()
    # NAL header: type 33 (SPS), layer 0, temporal_id_plus1 1
    return bytes((33 << 1, 1)) + rbsp_escape(w.bytes())


def parse_hevc_sps(nal: bytes) -> Optional[dict]:
    """HEVC SPS NAL -> {'profile_space','tier','profile_idc',
    'profile_compat','level_idc','chroma_format_idc','width','height',
    'bit_depth_luma'}, or None.  Handles sub-layer profile_tier_level
    syntax and the conformance-window crop arithmetic."""
    if len(nal) < 4 or (nal[0] >> 1) & 0x3F != 33:
        return None
    try:
        r = BitReader(rbsp_unescape(nal[2:]))
        r.u(4)  # vps id
        max_sub_layers = r.u(3)
        r.u(1)  # temporal_id_nesting
        space = r.u(2)
        tier = r.u(1)
        profile = r.u(5)
        compat = r.u(32)
        r.u(48)  # progressive/interlaced/non_packed/frame_only + reserved
        level = r.u(8)
        if max_sub_layers:
            prof_present = []
            lvl_present = []
            for _ in range(max_sub_layers):
                prof_present.append(r.u(1))
                lvl_present.append(r.u(1))
            for _ in range(max_sub_layers, 8):
                r.u(2)  # reserved_zero_2bits
            for i in range(max_sub_layers):
                if prof_present[i]:
                    r.u(88)
                if lvl_present[i]:
                    r.u(8)
        r.ue()  # sps id
        chroma = r.ue()
        separate = r.u(1) if chroma == 3 else 0
        lw = r.ue()
        lh = r.ue()
        crop_l = crop_r = crop_t = crop_b = 0
        if r.u(1):  # conformance_window_flag
            crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
        bd_luma = 8 + r.ue()
        # crop units (§7.4.3.2.1): SubWidthC/SubHeightC by chroma format
        if chroma == 1 and not separate:
            sw, sh = 2, 2
        elif chroma == 2 and not separate:
            sw, sh = 2, 1
        else:
            sw, sh = 1, 1
        return {
            "profile_space": space,
            "tier": tier,
            "profile_idc": profile,
            "profile_compat": compat,
            "level_idc": level,
            "chroma_format_idc": chroma,
            "width": lw - sw * (crop_l + crop_r),
            "height": lh - sh * (crop_t + crop_b),
            "bit_depth_luma": bd_luma,
        }
    except ValueError:
        return None


def build_hvcc(
    profile_idc: int = 1,
    tier: int = 0,
    level_idc: int = 93,
    compat_flags: Optional[int] = None,
    constraint_flags: int = 0xB00000000000,
    chroma_format_idc: int = 1,
    bit_depth: int = 8,
    sps: Optional[bytes] = None,
) -> bytes:
    """HEVCDecoderConfigurationRecord.  With ``sps`` a real SPS NAL
    (``build_hevc_sps``) rides in a type-33 NAL array — the layout
    every real hvcC uses, and what makes coded dims recoverable.
    Default compatibility flags mirror the common Main-profile pattern
    (the profile's own bit + the general bit 0 set)."""
    if compat_flags is None:
        # canonical values: Main (1) streams decode on Main and Main-10
        # decoders -> flag[1]|flag[2] = 0x60000000 (string "...1.6.L93");
        # Main 10 (2) -> flag[2] only = 0x20000000 (string "...2.4.L120")
        if profile_idc == 1:
            compat_flags = 0x60000000
        elif profile_idc == 2:
            compat_flags = 0x20000000
        else:
            compat_flags = 1 << (31 - profile_idc)
    w = BitWriter()
    w.u(1, 8)  # configurationVersion
    w.u(0, 2).u(tier, 1).u(profile_idc, 5)
    w.u(compat_flags, 32)
    w.u(constraint_flags, 48)
    w.u(level_idc, 8)
    w.u(0xF, 4).u(0, 12)  # min_spatial_segmentation_idc
    w.u(0x3F, 6).u(0, 2)  # parallelismType
    w.u(0x3F, 6).u(chroma_format_idc, 2)
    w.u(0x1F, 5).u(bit_depth - 8, 3)  # bit_depth_luma_minus8
    w.u(0x1F, 5).u(bit_depth - 8, 3)  # bit_depth_chroma_minus8
    w.u(0, 16)  # avgFrameRate
    w.u(0, 2).u(1, 3).u(1, 1).u(3, 2)  # cfr/numTemporalLayers/nested/len-1
    if sps is None:
        w.u(0, 8)  # numOfArrays
        return w.bytes()
    w.u(1, 8)  # numOfArrays
    w.u(1, 1).u(0, 1).u(33, 6)  # array_completeness / reserved / SPS
    w.u(1, 16)  # numNalus
    w.u(len(sps), 16)
    out = w.bytes() + sps
    return out


def parse_hvcc(body: bytes) -> Optional[dict]:
    if len(body) < 23 or body[0] != 1:
        return None
    r = BitReader(body)
    r.u(8)
    space = r.u(2)
    tier = r.u(1)
    profile = r.u(5)
    compat = r.u(32)
    constraint = r.u(48)
    level = r.u(8)
    out = {
        "profile_space": space,
        "tier": tier,
        "profile_idc": profile,
        "profile_compat": compat,
        "constraint_flags": constraint,
        "level_idc": level,
        "chroma_format_idc": body[16] & 3,
        "bit_depth_luma": (body[17] & 7) + 8,
    }
    # NAL arrays: a type-33 entry carries the SPS -> coded dims
    try:
        pos = 23
        for _ in range(body[22]):
            ntype = body[pos] & 0x3F
            (n_nalus,) = struct.unpack_from(">H", body, pos + 1)
            pos += 3
            for _ in range(n_nalus):
                (ln,) = struct.unpack_from(">H", body, pos)
                pos += 2
                if ntype == 33:
                    sps = parse_hevc_sps(body[pos : pos + ln])
                    if sps:
                        out.update(
                            {"width": sps["width"], "height": sps["height"]}
                        )
                pos += ln
    except (IndexError, struct.error):
        pass
    return out


# ------------------------------------------------------------------ #
# AV1 (av1C record + §5.5 sequence_header_obu)


def build_av1c(
    seq_profile: int = 0,
    seq_level_idx: int = 8,
    seq_tier: int = 0,
    high_bitdepth: bool = False,
    twelve_bit: bool = False,
    monochrome: bool = False,
    chroma_subsampling_x: int = 1,
    chroma_subsampling_y: int = 1,
    config_obus: bytes = b"",
) -> bytes:
    return (
        bytes(
            (
                0x81,  # marker=1, version=1
                (seq_profile << 5) | seq_level_idx,
                (seq_tier << 7)
                | (high_bitdepth << 6)
                | (twelve_bit << 5)
                | (monochrome << 4)
                | (chroma_subsampling_x << 3)
                | (chroma_subsampling_y << 2),
                0,
            )
        )
        + config_obus
    )


def parse_av1c(body: bytes) -> Optional[dict]:
    if len(body) < 4 or body[0] != 0x81:
        return None
    out = {
        "seq_profile": body[1] >> 5,
        "seq_level_idx": body[1] & 0x1F,
        "seq_tier": body[2] >> 7,
        "high_bitdepth": bool(body[2] & 0x40),
        "twelve_bit": bool(body[2] & 0x20),
        "monochrome": bool(body[2] & 0x10),
        "chroma_subsampling_x": (body[2] >> 3) & 1,
        "chroma_subsampling_y": (body[2] >> 2) & 1,
        "config_obus": body[4:],
    }
    seq = parse_av1_seq_header_obu(body[4:]) if len(body) > 4 else None
    if seq:
        out.update({"width": seq["width"], "height": seq["height"]})
    return out


def build_av1_seq_header_obu(
    width: int,
    height: int,
    seq_profile: int = 0,
    seq_level_idx: int = 8,
    high_bitdepth: bool = False,
    monochrome: bool = False,
) -> bytes:
    """A reduced-still-picture sequence header OBU (the AVIF shape) with
    a size field — enough syntax for real decoders to accept intra
    streams, and the round-trip twin of ``parse_av1_seq_header_obu``."""
    w = BitWriter()
    w.u(seq_profile, 3)
    w.u(1, 1)  # still_picture
    w.u(1, 1)  # reduced_still_picture_header
    w.u(seq_level_idx, 5)
    w.u(width.bit_length() - 1 if width > 1 else 0, 4)  # frame_width_bits-1
    w.u(height.bit_length() - 1 if height > 1 else 0, 4)
    w.u(width - 1, max(width.bit_length(), 1))
    w.u(height - 1, max(height.bit_length(), 1))
    w.u(1, 1)  # use_128x128_superblock
    w.u(0, 1).u(0, 1)  # filter_intra, intra_edge_filter
    # reduced header skips the inter tool flags (§5.5.1)
    w.u(0, 1)  # enable_superres
    w.u(0, 1)  # enable_cdef
    w.u(0, 1)  # enable_restoration
    # color_config (§5.5.2)
    w.u(1 if high_bitdepth else 0, 1)
    if seq_profile == 2 and high_bitdepth:
        w.u(0, 1)  # twelve_bit
    if seq_profile != 1:
        w.u(1 if monochrome else 0, 1)
    w.u(0, 1)  # color_description_present_flag
    if monochrome:
        # §5.5.2: mono_chrome reads color_range and RETURNS — no
        # chroma-position or separate_uv_delta_q bits
        w.u(0, 1)  # color_range
    else:
        w.u(0, 1)  # color_range
        if seq_profile == 0:
            w.u(0, 2)  # chroma_sample_position (4:2:0 implied)
        w.u(0, 1)  # separate_uv_delta_q
    w.u(0, 1)  # film_grain_params_present
    w.byte_align()
    payload = w.bytes()
    hdr = BitWriter()
    hdr.u(0, 1).u(1, 4).u(0, 1).u(1, 1).u(0, 1)  # type=1, has_size=1
    hdr.leb128(len(payload))
    return hdr.bytes() + payload


def parse_av1_seq_header_obu(data: bytes) -> Optional[dict]:
    """First sequence-header OBU in ``data`` -> {'seq_profile',
    'seq_level_idx','seq_tier','width','height','high_bitdepth',
    'monochrome'}, or None.  Handles the full §5.5 syntax including
    timing/decoder-model info and multiple operating points."""
    try:
        pos = 0
        while pos < len(data):
            r = BitReader(data[pos:])
            if r.u(1):  # obu_forbidden_bit
                return None
            obu_type = r.u(4)
            ext = r.u(1)
            has_size = r.u(1)
            r.u(1)  # reserved
            if ext:
                r.u(8)
            size = r.leb128() if has_size else len(data) - pos - (r.pos // 8)
            if obu_type != 1:  # not sequence header: skip
                pos += (r.pos // 8) + size
                continue
            seq_profile = r.u(3)
            r.u(1)  # still_picture
            reduced = r.u(1)
            if reduced:
                level0, tier0 = r.u(5), 0
                decoder_model_info = False
                buffer_delay_bits = 0
            else:
                timing_present = r.u(1)
                decoder_model_info = False
                buffer_delay_bits = 0
                if timing_present:
                    r.u(32)  # num_units_in_display_tick
                    r.u(32)  # time_scale
                    if r.u(1):  # equal_picture_interval
                        r.uvlc()  # num_ticks_per_picture_minus_1
                    decoder_model_info = bool(r.u(1))
                    if decoder_model_info:
                        buffer_delay_bits = r.u(5) + 1
                        r.u(32)  # num_units_in_decoding_tick
                        r.u(5)  # buffer_removal_time_length_minus_1
                        r.u(5)  # frame_presentation_time_length_minus_1
                initial_delay_present = r.u(1)
                n_ops = r.u(5) + 1
                level0 = tier0 = 0
                for i in range(n_ops):
                    r.u(12)  # operating_point_idc
                    lvl = r.u(5)
                    tier = r.u(1) if lvl > 7 else 0
                    if i == 0:
                        level0, tier0 = lvl, tier
                    if decoder_model_info and r.u(1):
                        r.u(buffer_delay_bits)  # decoder_buffer_delay
                        r.u(buffer_delay_bits)  # encoder_buffer_delay
                        r.u(1)  # low_delay_mode_flag
                    if initial_delay_present and r.u(1):
                        r.u(4)  # initial_display_delay_minus_1
            wbits = r.u(4) + 1
            hbits = r.u(4) + 1
            width = r.u(wbits) + 1
            height = r.u(hbits) + 1
            if not reduced:
                if r.u(1):  # frame_id_numbers_present_flag
                    r.u(4)  # delta_frame_id_length_minus_2
                    r.u(3)  # additional_frame_id_length_minus_1
            r.u(1)  # use_128x128_superblock
            r.u(1)  # enable_filter_intra
            r.u(1)  # enable_intra_edge_filter
            if not reduced:
                r.u(1)  # enable_interintra_compound
                r.u(1)  # enable_masked_compound
                r.u(1)  # enable_warped_motion
                r.u(1)  # enable_dual_filter
                enable_order_hint = r.u(1)
                if enable_order_hint:
                    r.u(1)  # enable_jnt_comp
                    r.u(1)  # enable_ref_frame_mvs
                # §5.5.1: choose flag set -> SELECT (2), else explicit bit
                force_sct = 2 if r.u(1) else r.u(1)
                if force_sct > 0:
                    if not r.u(1):  # seq_choose_integer_mv == 0
                        r.u(1)  # seq_force_integer_mv
                if enable_order_hint:
                    r.u(3)  # order_hint_bits_minus_1
            r.u(1)  # enable_superres
            r.u(1)  # enable_cdef
            r.u(1)  # enable_restoration
            high_bd = r.u(1)
            if seq_profile == 2 and high_bd:
                r.u(1)  # twelve_bit
            mono = r.u(1) if seq_profile != 1 else 0
            return {
                "seq_profile": seq_profile,
                "seq_level_idx": level0,
                "seq_tier": tier0,
                "width": width,
                "height": height,
                "high_bitdepth": bool(high_bd),
                "monochrome": bool(mono),
            }
        return None
    except ValueError:
        return None


# ------------------------------------------------------------------ #
# VP9 (vpcC, VP Codec ISO Media File Format Binding §2.2.1)


def build_vpcc(
    profile: int = 0,
    level: int = 10,
    bit_depth: int = 8,
    chroma_subsampling: int = 1,
    full_range: bool = False,
) -> bytes:
    return (
        b"\x01\x00\x00\x00"  # FullBox version 1, flags 0
        + bytes(
            (
                profile,
                level,
                (bit_depth << 4) | (chroma_subsampling << 1) | int(full_range),
                1,  # colourPrimaries (BT.709)
                1,  # transferCharacteristics
                1,  # matrixCoefficients
            )
        )
        + b"\x00\x00"  # codecInitializationDataSize = 0
    )


def parse_vpcc(body: bytes) -> Optional[dict]:
    if len(body) < 12 or body[0] != 1:
        return None
    return {
        "profile": body[4],
        "level": body[5],
        "bit_depth": body[6] >> 4,
        "chroma_subsampling": (body[6] >> 1) & 7,
        "full_range": bool(body[6] & 1),
    }


# ------------------------------------------------------------------ #
# AAC esds (ISO 14496-1 descriptors + 14496-3 AudioSpecificConfig)

AAC_FREQ_TABLE = (
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
)


def _desc(tag: int, body: bytes) -> bytes:
    # expandable length: 7 bits per byte, 0x80 continuation
    ln = len(body)
    size = bytearray()
    size.append(ln & 0x7F)
    ln >>= 7
    while ln:
        size.insert(0, 0x80 | (ln & 0x7F))
        ln >>= 7
    return bytes((tag,)) + bytes(size) + body


def _read_desc(data: bytes, pos: int) -> Tuple[int, int, int]:
    """-> (tag, body_start, body_end)"""
    tag = data[pos]
    pos += 1
    ln = 0
    for _ in range(4):
        b = data[pos]
        pos += 1
        ln = (ln << 7) | (b & 0x7F)
        if not b & 0x80:
            break
    return tag, pos, pos + ln


def build_esds(
    object_type: int = 0x40,
    aot: int = 2,
    sample_rate: int = 44100,
    channels: int = 2,
) -> bytes:
    """esds FullBox body: ES_Descriptor > DecoderConfigDescriptor(OTI) >
    DecoderSpecificInfo(AudioSpecificConfig) + SLConfig.  ``object_type``
    0x40 = MPEG-4 Audio (AOT in the ASC), 0x6B = MP3."""
    asc = b""
    if object_type == 0x40:
        freq_idx = AAC_FREQ_TABLE.index(sample_rate)
        w = BitWriter()
        w.u(aot, 5).u(freq_idx, 4).u(channels, 4)
        w.u(0, 3)  # GASpecificConfig: 1024 frames, no core, no extension
        asc = _desc(0x05, w.bytes())
    dcd = _desc(
        0x04,
        bytes((object_type, (5 << 2) | 1)) + b"\x00" * 11 + asc,
    )
    es = _desc(0x03, b"\x00\x01\x00" + dcd + _desc(0x06, b"\x02"))
    return b"\x00\x00\x00\x00" + es


def parse_esds(body: bytes) -> Optional[dict]:
    """esds FullBox body -> {'object_type','aot','sample_rate','channels'}
    (aot/rate/channels None for non-MPEG-4-Audio OTIs)."""
    try:
        tag, pos, end = _read_desc(body, 4)
        if tag != 0x03:
            return None
        pos += 3  # ES_ID + flags
        while pos < end:
            tag, b, e = _read_desc(body, pos)
            if tag == 0x04:
                oti = body[b]
                out = {
                    "object_type": oti,
                    "aot": None,
                    "sample_rate": None,
                    "channels": None,
                }
                p2 = b + 13
                while p2 < e:
                    t2, b2, e2 = _read_desc(body, p2)
                    if t2 == 0x05 and oti == 0x40 and e2 > b2 + 1:
                        r = BitReader(body[b2:e2])
                        out["aot"] = r.u(5)
                        fi = r.u(4)
                        if fi == 15:
                            out["sample_rate"] = r.u(24)
                        elif fi < len(AAC_FREQ_TABLE):
                            out["sample_rate"] = AAC_FREQ_TABLE[fi]
                        out["channels"] = r.u(4)
                    p2 = e2
                return out
            pos = e
        return None
    except (IndexError, ValueError):
        return None


# ------------------------------------------------------------------ #
# Opus dOps (Opus-in-ISOBMFF §4.3.2)


def build_dops(
    channels: int = 2,
    pre_skip: int = 312,
    input_sample_rate: int = 48000,
    output_gain: int = 0,
) -> bytes:
    return struct.pack(
        ">BBHIhB", 0, channels, pre_skip, input_sample_rate, output_gain, 0
    )


def parse_dops(body: bytes) -> Optional[dict]:
    if len(body) < 11 or body[0] != 0:
        return None
    ver, ch, skip, rate, gain, fam = struct.unpack_from(">BBHIhB", body, 0)
    return {
        "channels": ch,
        "pre_skip": skip,
        "input_sample_rate": rate,
        "output_gain": gain,
        "mapping_family": fam,
    }


def build_opus_head(
    channels: int = 2,
    pre_skip: int = 312,
    input_sample_rate: int = 48000,
    output_gain: int = 0,
) -> bytes:
    """OpusHead identification header (RFC 7845 §5.1) — the Matroska
    A_OPUS CodecPrivate payload and the Ogg BOS packet.  Same fields as
    ``dOps`` but little-endian behind the magic."""
    return b"OpusHead" + struct.pack(
        "<BBHIhB", 1, channels, pre_skip, input_sample_rate, output_gain, 0
    )


def parse_opus_head(body: bytes) -> Optional[dict]:
    if len(body) < 19 or body[:8] != b"OpusHead" or body[8] != 1:
        return None
    ver, ch, skip, rate, gain, fam = struct.unpack_from("<BBHIhB", body, 8)
    return {
        "channels": ch,
        "pre_skip": skip,
        "input_sample_rate": rate,
        "output_gain": gain,
        "mapping_family": fam,
    }


def build_vp9_codec_private(
    profile: int = 0, level: int = 10, bit_depth: int = 8,
    chroma_subsampling: int = 1,
) -> bytes:
    """Matroska V_VP9 CodecPrivate (WebM spec): a sequence of
    (id, length, value) features — 1=Profile, 2=Level, 3=BitDepth,
    4=ChromaSubsampling."""
    return bytes(
        (1, 1, profile, 2, 1, level, 3, 1, bit_depth,
         4, 1, chroma_subsampling)
    )


def parse_vp9_codec_private(body: bytes) -> Optional[dict]:
    out = {"profile": None, "level": None, "bit_depth": None,
           "chroma_subsampling": None}
    names = {1: "profile", 2: "level", 3: "bit_depth",
             4: "chroma_subsampling"}
    pos = 0
    seen = False
    while pos + 2 <= len(body):
        fid, ln = body[pos], body[pos + 1]
        pos += 2
        if pos + ln > len(body):
            return None
        if fid in names and ln == 1:
            out[names[fid]] = body[pos]
            seen = True
        pos += ln
    return out if seen else None


# ------------------------------------------------------------------ #
# RFC 6381 codec strings


def _hevc_compat_hex(flags: int) -> str:
    # ISO 14496-15 Annex E.3: the 32 bits are emitted bit-REVERSED,
    # as hex with trailing (post-reversal) zero nibbles dropped
    rev = 0
    for i in range(32):
        if flags & (1 << i):
            rev |= 1 << (31 - i)
    # minimal hex of the reversed value ("6" for Main's 0x60000000)
    return f"{rev:X}"


def codec_string(fourcc: str, cfg: Optional[dict]) -> str:
    """RFC 6381 / ISO 14496-15 Annex E codec parameter string for a
    sample entry, e.g. ``avc1.64001F``, ``hev1.1.6.L93.B0``,
    ``av01.0.08M.08``, ``vp09.00.10.08``, ``mp4a.40.2``, ``Opus``.
    Falls back to the bare fourcc when the config is missing."""
    if not cfg:
        return fourcc
    if fourcc in ("avc1", "avc3") and "profile_idc" in cfg:
        return (
            f"{fourcc}.{cfg['profile_idc']:02X}"
            f"{cfg.get('profile_compat', cfg.get('constraint_flags', 0)):02X}"
            f"{cfg['level_idc']:02X}"
        )
    if fourcc in ("hvc1", "hev1") and "profile_idc" in cfg:
        space = ("", "A", "B", "C")[cfg.get("profile_space", 0)]
        tier = "H" if cfg.get("tier") else "L"
        cons = cfg.get("constraint_flags", 0).to_bytes(6, "big")
        # drop all-zero trailing constraint bytes, keep at least one
        parts = [f"{b:02X}" for b in cons]
        while len(parts) > 1 and parts[-1] == "00":
            parts.pop()
        return (
            f"{fourcc}.{space}{cfg['profile_idc']}."
            f"{_hevc_compat_hex(cfg.get('profile_compat', 0)).upper()}."
            f"{tier}{cfg['level_idc']}." + ".".join(parts)
        )
    if fourcc == "av01" and "seq_profile" in cfg:
        depth = 12 if cfg.get("twelve_bit") else 10 if cfg.get("high_bitdepth") else 8
        tier = "H" if cfg.get("seq_tier") else "M"
        return (
            f"av01.{cfg['seq_profile']}."
            f"{cfg['seq_level_idx']:02d}{tier}.{depth:02d}"
        )
    if fourcc == "vp09" and cfg.get("profile") is not None:
        if cfg.get("level") is None or cfg.get("bit_depth") is None:
            return fourcc  # partial VP9 feature list: no full tag
        return f"vp09.{cfg['profile']:02d}.{cfg['level']:02d}.{cfg['bit_depth']:02d}"
    if fourcc == "mp4a" and cfg.get("object_type") is not None:
        s = f"mp4a.{cfg['object_type']:02X}"
        if cfg.get("aot") is not None:
            s += f".{cfg['aot']}"
        return s
    return fourcc
