"""Baseline-JPEG codec tests (operators/jpeg.py) and its multimodal
integration: closed-form constant decode, lossy round-trip bounds,
4:2:0 + restart-marker paths, header parsing, rejection boundary, and
the Spark/DuckDB plumbing that rides on it.

Reference note: the reference engine (duzun/hQuery.php) has no image
codec — this is beyond-reference multimodal surface, held to the same
fault-tolerance doctrine as its charset path (HTML_Index.php:768-803):
decode what you can, NULL what you cannot, never abort.
"""

import struct

import numpy as np
import pytest

from hquery_php_spark.operators.jpeg import (
    constant_gray_decoded_level,
    decode_jpeg,
    encode_jpeg,
    jpeg_dims,
    quant_tables,
)
from hquery_php_spark.operators.multimodal import decode_image, sniff_media_type


def _gradient(h=37, w=53):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 3) % 256, (y * 5) % 256, (x + y) % 256], -1).astype(
        np.uint8
    )


# ------------------------------------------------------------------ #
# Closed form: constant gray decodes to the integer formula


@pytest.mark.parametrize("quality", [30, 50, 75, 90])
def test_constant_gray_closed_form(quality):
    for c in range(0, 256, 11):
        px = np.full((8, 16, 3), c, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(px, quality))
        assert dec is not None
        got = set(np.unique(dec[3]))
        assert got == {constant_gray_decoded_level(c, quality)}, (quality, c)


def test_constant_closed_form_all_encoder_modes():
    # subsampling and restarts must not change a constant image's level
    for c in (0, 7, 128, 200, 255):
        want = {constant_gray_decoded_level(c, 30)}
        px = np.full((24, 16, 3), c, dtype=np.uint8)
        for kw in (
            {},
            {"subsampling": "420"},
            {"restart_interval": 1},
            {"subsampling": "420", "restart_interval": 2},
        ):
            dec = decode_jpeg(encode_jpeg(px, 30, **kw))
            assert set(np.unique(dec[3])) == want, (c, kw)


def test_closed_form_boundary_clamps():
    # c=255 quantizes past 255 at quality 30 (q00=27) — the clamp row
    q00 = int(quant_tables(30)[0][0])
    assert q00 == 27
    assert constant_gray_decoded_level(255, 30) == 255
    assert constant_gray_decoded_level(0, 30) == 0
    # gray 7 at q30 lands exactly on the .5 IDCT boundary (d ≡ 4 mod 8)
    assert constant_gray_decoded_level(7, 30) == 7


# ------------------------------------------------------------------ #
# Lossy round trip: bounded error, exact dims, determinism


def test_roundtrip_error_bounds():
    px = _gradient()
    for q, bound in ((95, 8), (75, 16), (50, 24)):
        w, h, ch, out = decode_jpeg(encode_jpeg(px, q))
        assert (w, h, ch) == (53, 37, 3)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= bound, q


def test_roundtrip_420_and_restarts():
    px = _gradient()
    for kw in (
        {"subsampling": "420"},
        {"restart_interval": 3},
        {"subsampling": "420", "restart_interval": 2},
    ):
        w, h, ch, out = decode_jpeg(encode_jpeg(px, 85, **kw))
        assert (w, h, ch) == (53, 37, 3)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 16, kw


def test_roundtrip_grayscale_and_odd_dims():
    y, x = np.mgrid[0:21, 0:13]
    g = np.clip(40 + x * 5 + y * 3, 0, 255).astype(np.uint8)
    w, h, ch, out = decode_jpeg(encode_jpeg(g, 90))
    assert (w, h, ch) == (13, 21, 1)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 8


# ------------------------------------------------------------------ #
# Progressive (SOF2): spectral selection + successive approximation.
# Progressive merely REORDERS the same quantized coefficients, so its
# decode must equal the baseline decode of the same image BIT-EXACTLY.


def test_progressive_equals_baseline_bit_exact():
    px = _gradient()
    base = decode_jpeg(encode_jpeg(px, 75))
    prog = decode_jpeg(encode_jpeg(px, 75, progressive=True))
    assert prog is not None and prog[:3] == base[:3]
    assert np.array_equal(prog[3], base[3])


def test_progressive_grayscale_and_constants():
    y, x = np.mgrid[0:21, 0:13]
    g = ((x * 7 + y * 3) % 256).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, 85, progressive=True))[3],
        decode_jpeg(encode_jpeg(g, 85))[3],
    )
    # constants: DC-only blocks + maximal EOB runs; closed form holds
    for c in (0, 7, 128, 255):
        px = np.full((24, 16, 3), c, dtype=np.uint8)
        got = set(np.unique(decode_jpeg(encode_jpeg(px, 30, progressive=True))[3]))
        assert got == {constant_gray_decoded_level(c, 30)}, c


def test_progressive_sparse_and_noise_fuzz():
    # sparse → long zero runs + ZRL-in-refine; noise → dense refinement
    rng = np.random.default_rng(7)
    cases = [np.zeros((64, 64, 3), np.uint8)]
    cases[0][5, 9] = [255, 0, 0]
    cases[0][40, 33] = [0, 255, 0]
    for _ in range(6):
        h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        cases.append(rng.integers(0, 256, (h, w, 3)).astype(np.uint8))
    for q in (20, 75):
        for px in cases:
            b = decode_jpeg(encode_jpeg(px, q))
            p = decode_jpeg(encode_jpeg(px, q, progressive=True))
            assert p is not None and np.array_equal(p[3], b[3]), (q, px.shape)


def test_progressive_dims_and_writer_guards():
    data = encode_jpeg(_gradient(21, 13), 75, progressive=True)
    assert jpeg_dims(data) == (13, 21)
    assert decode_jpeg(data[: len(data) - 20]) is None or True  # no raise
    import pytest as _pytest

    with _pytest.raises(ValueError):
        encode_jpeg(_gradient(8, 8), 75, subsampling="420", progressive=True)
    with _pytest.raises(ValueError):
        encode_jpeg(_gradient(8, 8), 75, restart_interval=2, progressive=True)


def test_decode_deterministic():
    data = encode_jpeg(_gradient(16, 16), 75)
    a = decode_jpeg(data)[3]
    b = decode_jpeg(data)[3]
    assert np.array_equal(a, b)
    # byte-stable encode too
    assert encode_jpeg(_gradient(16, 16), 75) == data


# ------------------------------------------------------------------ #
# Header parse + rejection boundary


def test_jpeg_dims_full_and_header_only():
    data = encode_jpeg(_gradient(21, 13), 75)
    assert jpeg_dims(data) == (13, 21)
    # 15-byte SOI+SOF0 header (the driver's meta payload shape)
    hdr = bytes.fromhex("FFD8FFC0000B08") + struct.pack(">HH", 48, 40) + bytes.fromhex("01011100")
    assert jpeg_dims(hdr) == (40, 48)
    assert sniff_media_type(hdr) == "image/jpeg"
    assert jpeg_dims(b"\xff\xd8\xff\xd9") is None


def test_decode_rejects_out_of_scope():
    # truncated progressive: SOF2 header with no scan data
    prog = bytes.fromhex("FFD8FFC2000B08") + struct.pack(">HH", 8, 8) + bytes.fromhex("01011100")
    assert decode_jpeg(prog) is None
    # truncated arithmetic (SOF9) header with no scan data — in scope
    # since the Annex D coder landed, but still fault-tolerant
    arith = bytes.fromhex("FFD8FFC9000B08") + struct.pack(">HH", 8, 8) + bytes.fromhex("01011100")
    assert decode_jpeg(arith) is None
    # truncated entropy data
    full = encode_jpeg(_gradient(16, 16), 75)
    assert decode_jpeg(full[: len(full) // 2]) is None or True  # must not raise
    assert decode_jpeg(b"") is None
    assert decode_jpeg(None) is None
    assert decode_jpeg(b"not a jpeg at all") is None
    # 16-bit quant table (Pq=1) is out of scope
    dqt16 = b"\xff\xd8\xff\xdb\x00\x43\x10" + bytes(64) + b"\xff\xd9"
    assert decode_jpeg(dqt16) is None


def test_decode_image_dispatch():
    from hquery_php_spark.operators.multimodal import encode_png

    px = _gradient(8, 8)
    png = encode_png(px)
    w, h, ch, out = decode_image(png)
    assert (w, h, ch) == (8, 8, 3) and np.array_equal(out, px)
    jpg = encode_jpeg(np.full((8, 8, 3), 99, np.uint8), 75)
    w, h, ch, out = decode_image(jpg)
    assert (w, h, ch) == (8, 8, 3)
    assert set(np.unique(out)) == {constant_gray_decoded_level(99, 75)}
    assert decode_image(b"GIF89a......") is None
    assert decode_image(None) is None


# ------------------------------------------------------------------ #
# Spark integration (meta dims + pixel stats over mixed codecs)


@pytest.fixture(scope="module")
def spark():
    pyspark = pytest.importorskip("pyspark")
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("hquery-jpeg-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_image_meta_and_stats_mixed_codecs(spark):
    from hquery_php_spark.operators.multimodal import (
        encode_png,
        image_meta_df,
        image_pixel_stats_df,
    )

    png = encode_png(np.full((4, 6, 3), 10, np.uint8))
    jpg = encode_jpeg(np.full((8, 16, 3), 200, np.uint8), 30)
    rows = [("p1", bytearray(png)), ("j1", bytearray(jpg)), ("x1", bytearray(b"??"))]
    df = spark.createDataFrame(rows, "media_id string, payload binary")

    meta = {r.media_id: r for r in image_meta_df(df).collect()}
    assert meta["p1"].mime == "image/png" and (meta["p1"].width, meta["p1"].height) == (6, 4)
    assert meta["j1"].mime == "image/jpeg" and (meta["j1"].width, meta["j1"].height) == (16, 8)
    assert meta["x1"].width is None

    stats = {r.media_id: r for r in image_pixel_stats_df(df).collect()}
    assert stats["p1"].sum_r == 4 * 6 * 10
    p = constant_gray_decoded_level(200, 30)
    assert stats["j1"].sum_r == stats["j1"].sum_g == stats["j1"].sum_b == 8 * 16 * p
    assert stats["j1"].sum_a == 255 * 8 * 16
    assert stats["x1"].n_px is None  # allow_stub default: NULL row

    with pytest.raises(Exception):
        image_pixel_stats_df(df, allow_stub=False).collect()


def test_image_resize_real_pixels(spark):
    """Resize is no longer a stub for decodable payloads: PNG and JPEG
    inputs decode, nearest-resample, and re-encode as PNG whose pixels
    are an exact index-gather of the source."""
    from hquery_php_spark.operators.multimodal import (
        _nearest_resample,
        decode_png,
        encode_png,
        image_resize_df,
    )

    y, x = np.mgrid[0:100, 0:200]
    px = np.stack([x % 256, y % 256, (x + y) % 256], -1).astype(np.uint8)
    rows = [
        ("png", bytearray(encode_png(px))),
        ("jpg", bytearray(encode_jpeg(np.full((96, 128, 3), 77, np.uint8), 75))),
        ("junk", bytearray(b"??")),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r.media_id: r for r in image_resize_df(df, target=64).collect()}

    r = out["png"]
    assert (r.out_w, r.out_h) == (64, 32)
    w, h, ch, got = decode_png(bytes(r.payload))
    assert (w, h, ch) == (64, 32, 3)
    assert np.array_equal(got, _nearest_resample(px, 64, 32))

    j = out["jpg"]
    assert (j.out_w, j.out_h) == (64, 48)
    w, h, ch, got = decode_png(bytes(j.payload))
    assert (w, h) == (64, 48)
    assert set(np.unique(got)) == {constant_gray_decoded_level(77, 75)}

    assert (out["junk"].out_w, out["junk"].out_h) == (0, 0)


def test_binned_quantiles_negative_values_lockstep(spark):
    """DuckDB // truncates toward zero; the twin's _fdiv floor must bin
    negative values identically to Spark's floor() (-150 → bin -2)."""
    import duckdb

    from hquery_php_spark.operators.sketches import (
        binned_quantiles,
        binned_quantiles_oracle_sql,
    )

    rows = [("a", v) for v in (-250, -150, -100, -1, 0, 1, 99, 100, 251)] + [
        ("b", v) for v in (-5, -305, 7, 1000)
    ]
    sdf = spark.createDataFrame(rows, "source string, n_chars long")
    got = {
        r.source: (r.p50, r.p90, r.p99)
        for r in binned_quantiles(sdf, "n_chars").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"('{s}', {v})" for s, v in rows)
        + ") t(source, n_chars)"
    )
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(binned_quantiles_oracle_sql()).fetchall()
    }
    assert got == want
    # the floor bin itself: -150 must land in bin -2 (value -200)
    assert got["a"][0] in (-200, -100, 0)  # sanity: median within range


def test_exif_orientation_walk():
    """APP1 EXIF orientation in both byte orders, reusing the TIFF IFD
    reader; absent/corrupt APP1 and non-JPEG bytes return None."""
    import struct

    from hquery_php_spark.operators.jpeg import (
        jpeg_dims,
        jpeg_exif_orientation,
    )

    def exif_app1(orient, le=True):
        bo = "<" if le else ">"
        hdr = b"II*\x00" if le else b"MM\x00*"
        tiff = (
            hdr + struct.pack(bo + "I", 8) + struct.pack(bo + "H", 1)
            + struct.pack(bo + "HHI", 274, 3, 1)
            + struct.pack(bo + "H", orient) + b"\x00\x00"
            + struct.pack(bo + "I", 0)
        )
        body = b"Exif\x00\x00" + tiff
        return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body

    sof = b"\xff\xc0\x00\x0b\x08" + struct.pack(">HH", 24, 32) + b"\x01\x01\x11\x00"
    for le in (True, False):
        for o in (1, 5, 8):
            p = b"\xff\xd8" + exif_app1(o, le) + sof
            assert jpeg_exif_orientation(p) == o
            assert jpeg_dims(p) == (32, 24)  # dims walk skips APP1
    assert jpeg_exif_orientation(b"\xff\xd8" + sof) is None
    assert jpeg_exif_orientation(b"\xff\xd8" + exif_app1(9) + sof) is None  # >8
    assert jpeg_exif_orientation(b"\xff\xd8\xff\xe1\x00\x08Exif") is None
    assert jpeg_exif_orientation(b"not a jpeg") is None
    assert jpeg_exif_orientation(None) is None


def test_apply_exif_orientation_all_eight():
    """All eight corrections on an asymmetric raster: pinned pixel
    positions + the involution/rotation-group identities."""
    import numpy as np

    from hquery_php_spark.operators.multimodal import apply_exif_orientation

    # 2x3 raster, distinct values; v[y,x,0] = 10*y + x
    px = np.array([[[0], [1], [2]], [[10], [11], [12]]], dtype=np.uint8)
    A = apply_exif_orientation
    assert A(px, 1).tolist() == px.tolist()
    assert A(px, 2)[:, :, 0].tolist() == [[2, 1, 0], [12, 11, 10]]
    assert A(px, 3)[:, :, 0].tolist() == [[12, 11, 10], [2, 1, 0]]
    assert A(px, 4)[:, :, 0].tolist() == [[10, 11, 12], [0, 1, 2]]
    assert A(px, 5)[:, :, 0].tolist() == [[0, 10], [1, 11], [2, 12]]
    assert A(px, 6)[:, :, 0].tolist() == [[10, 0], [11, 1], [12, 2]]
    assert A(px, 7)[:, :, 0].tolist() == [[12, 2], [11, 1], [10, 0]]
    assert A(px, 8)[:, :, 0].tolist() == [[2, 12], [1, 11], [0, 10]]
    # group identities: 2,3,4,5,7 are involutions; 6 then 8 = identity
    for o in (2, 3, 4, 5, 7):
        assert A(A(px, o), o).tolist() == px.tolist()
    assert A(A(px, 6), 8).tolist() == px.tolist()
    assert A(px, None).tolist() == px.tolist()


def test_resize_honors_exif_orientation(tmp_path):
    """A full baseline JPEG with an injected APP1 orientation=6 block
    resizes to the ROTATED aspect; the re-encoded PNG decodes to the
    rotated raster."""
    import struct

    import numpy as np

    from hquery_php_spark.operators.jpeg import encode_jpeg
    from hquery_php_spark.operators.multimodal import (
        apply_exif_orientation,
        decode_image,
        decode_png,
    )

    def with_exif(jpg, orient):
        tiff = (
            b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 1)
            + struct.pack("<HHI", 274, 3, 1)
            + struct.pack("<H", orient) + b"\x00\x00" + struct.pack("<I", 0)
        )
        body = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
        return jpg[:2] + app1 + jpg[2:]

    gray = np.full((16, 32), 77, dtype=np.uint8)  # wide landscape
    jpg = with_exif(encode_jpeg(gray), 6)

    import pandas as pd

    from hquery_php_spark.operators.multimodal import image_resize_df

    # run the UDF body directly (no Spark session needed): call the
    # pandas-level pipeline through a local one-batch invocation
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        [("a", bytearray(jpg))], "media_id string, payload binary"
    )
    row = image_resize_df(df, target=64).collect()[0]
    # 32x16 stored; orientation 6 -> upright 16x32 (portrait)
    assert (row.out_w, row.out_h) == (16, 32)
    w, h, ch, px = decode_png(bytes(row.payload))
    assert (w, h) == (16, 32)
    # constant-gray content survives the rotate+resample round trip
    dec_w, dec_h, _, dec_px = decode_image(jpg)
    want = apply_exif_orientation(dec_px, 6)
    assert px[:, :, 0].tolist() == want[:, :, 0].tolist()
