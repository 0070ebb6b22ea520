"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
this module provides the real Spark plumbing — schemas, batch shapes,
partitioning-friendly signatures — with the codec step STUBBED (the
image/audio libraries are not in this container).  Each decode UDF:

* validates magic bytes / container headers itself (real, tested);
* emits deterministic fake features via ``_FAKE_FEATURES`` when
  ``allow_stub=True`` (default), so pipelines are end-to-end runnable;
* raises ``NotImplementedError`` naming the missing codec otherwise.

The batch interface is ``mapInPandas`` over Arrow record batches — the
binary payloads cross the JVM↔Python boundary exactly once.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "sniff_media_type",
    "image_meta_df",
    "image_features_df",
    "image_resize_df",
    "video_frame_sample_df",
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "audio/wav-or-webp"),  # refined below
    (b"ID3", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
    (b"fLaC", "audio/flac"),
    (b"\x1a\x45\xdf\xa3", "video/x-matroska-or-webm"),  # EBML, refined below
    (b"%PDF-", "application/pdf"),
    (b"BM", "image/bmp"),
]


def sniff_media_type(payload: Optional[bytes]) -> Optional[str]:
    """Magic-byte sniffing — real logic, no codec needed."""
    if not payload:
        return None
    # ISO-BMFF (mp4/mov/m4a...): size(4) + 'ftyp' + major brand at 8..12
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        brand = payload[8:12]
        if brand in (b"M4A ", b"M4B "):
            return "audio/mp4"
        if brand == b"qt  ":
            return "video/quicktime"
        return "video/mp4"
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            if mime == "audio/wav-or-webp":
                if payload[8:12] == b"WEBP":
                    return "image/webp"
                if payload[8:12] == b"WAVE":
                    return "audio/wav"
                if payload[8:12] == b"AVI ":
                    return "video/x-msvideo"
                return "application/riff"
            if mime == "video/x-matroska-or-webm":
                # EBML DocType string distinguishes webm from mkv
                head = payload[:64]
                if b"webm" in head:
                    return "video/webm"
                return "video/x-matroska"
            return mime
    return "application/octet-stream"


def _png_dims(payload: bytes) -> Optional[tuple]:
    # real header parse: IHDR is the first chunk after the 8-byte signature
    if len(payload) >= 24 and payload[12:16] == b"IHDR":
        w, h = _struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    return None


def image_meta_df(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Sniff mime + (PNG) dimensions per row — header parsing only."""
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("mime", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_bytes", IntegerType()),
        ]
    )
    narrow = df.select(F.col("media_id").cast("string"), F.col(payload_col).alias("p"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in schema.fieldNames()}
            for mid, p in zip(pdf["media_id"], pdf["p"]):
                payload = bytes(p) if p is not None else None
                mime = sniff_media_type(payload)
                dims = (
                    _png_dims(payload)
                    if payload and mime == "image/png"
                    else None
                )
                out["media_id"].append(mid)
                out["mime"].append(mime)
                out["width"].append(dims[0] if dims else None)
                out["height"].append(dims[1] if dims else None)
                out["n_bytes"].append(len(payload) if payload else 0)
            yield pd.DataFrame(out)

    return narrow.mapInPandas(run, schema)


def _fake_features(payload: bytes, dim: int) -> list:
    """Deterministic stand-in for a codec+model feature extractor: the
    sha256 of the payload expanded to ``dim`` floats in [-1, 1)."""
    out = []
    seed = payload or b""
    h = b""
    while len(out) < dim:
        h = hashlib.sha256(h + seed).digest()
        for i in range(0, len(h) - 1, 2):
            if len(out) >= dim:
                break
            v = int.from_bytes(h[i : i + 2], "big")
            out.append((v - 32768) / 32768.0)
    return out


def image_features_df(
    df: DataFrame,
    payload_col: str = "payload",
    dim: int = 64,
    allow_stub: bool = True,
) -> DataFrame:
    """Decode → resize → embed. The codec step is a STUB: with
    ``allow_stub`` (default) a deterministic fake embedding is emitted so
    the Spark plumbing (schema, batching, downstream ANN joins) runs end
    to end; with ``allow_stub=False`` this raises ``NotImplementedError``
    — wire a real decoder (PIL/torchvision) on a cluster that has one."""
    if not allow_stub:
        raise NotImplementedError(
            "image decode requires an image codec (PIL/libjpeg) not present "
            "in this environment; pass allow_stub=True for the deterministic "
            "fake-feature path"
        )
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    narrow = df.select(F.col("media_id").cast("string"), F.col(payload_col).alias("p"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "embedding": []}
            for mid, p in zip(pdf["media_id"], pdf["p"]):
                payload = bytes(p) if p is not None else b""
                out["media_id"].append(mid)
                out["embedding"].append(_fake_features(payload, dim))
            yield pd.DataFrame(out)

    return narrow.mapInPandas(run, schema)


def image_resize_df(
    df: DataFrame,
    payload_col: str = "payload",
    target: int = 64,
    allow_stub: bool = True,
) -> DataFrame:
    """Resize plumbing: header-aware target dimensions computed for real
    (aspect-preserving fit into ``target``×``target``), the pixel resample
    itself STUBBED (deterministic passthrough payload) — wire
    PIL/libvips where available."""
    if not allow_stub:
        raise NotImplementedError(
            "pixel resampling requires an image codec not present here; "
            "pass allow_stub=True for the header-only deterministic path"
        )
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("out_w", IntegerType()),
            StructField("out_h", IntegerType()),
            StructField("payload", BinaryType()),
        ]
    )
    narrow = df.select(F.col("media_id").cast("string"), F.col(payload_col).alias("p"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in schema.fieldNames()}
            for mid, p in zip(pdf["media_id"], pdf["p"]):
                payload = bytes(p) if p is not None else b""
                dims = (
                    _png_dims(payload)
                    if sniff_media_type(payload) == "image/png"
                    else None
                )
                if dims:
                    w, h = dims
                    scale = min(target / w, target / h, 1.0)
                    ow, oh = max(1, round(w * scale)), max(1, round(h * scale))
                else:
                    ow = oh = 0
                out["media_id"].append(mid)
                out["out_w"].append(ow)
                out["out_h"].append(oh)
                out["payload"].append(payload)  # STUB: pixels unchanged
            yield pd.DataFrame(out)

    return narrow.mapInPandas(run, schema)


def video_frame_sample_df(
    df: DataFrame,
    payload_col: str = "payload",
    every_n: int = 10,
    max_frames: int = 8,
    frame_bytes: int = 256,
) -> DataFrame:
    """Frame-sampling plumbing for video columns: container sniffing is
    real; without a demuxer, "frames" are deterministic fixed-stride byte
    windows of the payload — the schema, batching and fan-out (one row
    per sampled frame) are exactly what a real decoder drops into."""
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_no", IntegerType()),
            StructField("mime", StringType()),
            StructField("frame", BinaryType()),
        ]
    )
    narrow = df.select(F.col("media_id").cast("string"), F.col(payload_col).alias("p"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in schema.fieldNames()}
            for mid, p in zip(pdf["media_id"], pdf["p"]):
                payload = bytes(p) if p is not None else b""
                mime = sniff_media_type(payload)
                stride = frame_bytes * every_n
                for fno in range(max_frames):
                    start = fno * stride
                    if start >= len(payload):
                        break
                    out["media_id"].append(mid)
                    out["frame_no"].append(fno)
                    out["mime"].append(mime)
                    out["frame"].append(payload[start : start + frame_bytes])
            yield pd.DataFrame(out)

    return narrow.mapInPandas(run, schema)
