"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` stages.

Header-level decode is REAL: ``decode_image`` parses PNG IHDR and JPEG
SOF0/1/2 markers (pure-stdlib byte parsing — no codec needed) to extract
(format, width, height). Full pixel decode — needed for a true perceptual
hash — is the one stub left: this container ships no image codecs, so
``phash`` is a documented byte-level placeholder (``decode_pixels`` raises
NotImplementedError where a real deployment would call PIL/ffmpeg).
Schemas, batch shapes, UDF signatures and the dedup-per-asset pattern are
real and tested; swapping in a codec changes one function body.

Span documents carry media as ``media_ref``; this module is the stage
that would dereference those refs into bytes (a storage join) and extract
features for training-data filtering.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("phash", T.StringType(), True),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(kind: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(payload))
        + kind
        + payload
        + struct.pack(">I", zlib.crc32(kind + payload) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, payload: bytes = b"") -> bytes:
    """Minimal structurally-valid PNG (signature + IHDR + IDAT + IEND).
    The IDAT payload is opaque (not a valid zlib stream — dimensions are
    all the header decode needs)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", payload)
        + _png_chunk(b"IEND", b"")
    )


def encode_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG: SOI + SOF0 frame header carrying the dimensions."""
    sof = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"  # SOI
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof  # SOF0
        + b"\xff\xd9"  # EOI
    )


def fake_media_bytes(ref: str) -> bytes:
    """Deterministic stand-in for fetched media content: a real PNG whose
    IHDR dimensions derive from md5(ref) — the exact formula the DuckDB
    oracle recomputes (16 + hexbyte % 64). Fixed-size payload ⇒ n_bytes
    is the constant 121."""
    dig = hashlib.md5(ref.encode()).hexdigest()
    w = 16 + int(dig[0:2], 16) % 64
    h = 16 + int(dig[2:4], 16) % 64
    payload = bytes.fromhex(dig) * 4  # 64 deterministic bytes
    return encode_png(w, h, payload)


def decode_image(content: bytes) -> Optional[Tuple[str, int, int]]:
    """REAL header decode: (format, width, height) from PNG IHDR or JPEG
    SOF0/1/2 byte parsing; None when the bytes are neither (or truncated).

    PNG: 8-byte signature, IHDR is the first chunk — width/height are
    big-endian uint32 at offsets 16 and 20.
    JPEG: scan the marker stream from SOI for a start-of-frame marker
    (0xC0 baseline / 0xC1 extended / 0xC2 progressive); the frame header
    carries height then width as big-endian uint16."""
    if content is None or len(content) < 4:
        return None
    if content[:8] == _PNG_SIG:
        if len(content) < 24 or content[12:16] != b"IHDR":
            return None
        w, h = struct.unpack(">II", content[16:24])
        return "png", w, h
    if content[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        n = len(content)
        while i + 4 <= n:
            if content[i] != 0xFF:
                return None
            marker = content[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone marker, no length
                continue
            if marker == 0xD9:  # EOI
                return None
            seglen = struct.unpack(">H", content[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2):
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seglen
        return None
    return None


def decode_pixels(content: bytes):
    """Full pixel decode — STUB: no image codec ships in this container.
    A real deployment wires PIL.Image.open(io.BytesIO(content)) (or
    ffmpeg for video frame-sampling) here; everything downstream already
    consumes the (width, height, phash) columns this would feed."""
    raise NotImplementedError("no image codec in this environment")


def pseudo_phash(content: bytes) -> str:
    """Byte-level placeholder for a perceptual hash (a true pHash needs
    decode_pixels): md5 over the leading bytes — deterministic, stable
    for exact-duplicate assets, documented as NOT perception-aware."""
    return hashlib.md5(content[:64]).hexdigest()[:16]


def media_features(refs_df: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """media_ref rows → MEDIA_META rows via one Arrow pass: 'fetch' bytes
    (deterministic fake resolver — same seam as the page resolver), real
    header decode for format/dimensions, placeholder phash.

    Scale: repartition upstream by xxhash64(media_ref) (dedup fetches of
    the same asset with a first-wins window, exactly like URL dedup)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf[ref_col]:
                content = fake_media_bytes(ref)
                decoded = decode_image(content)
                fmt, w, h = decoded if decoded else ("bin", None, None)
                rows.append(
                    {
                        "media_ref": ref,
                        "content": content,
                        "n_bytes": len(content),
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "phash": pseudo_phash(content),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "content", "n_bytes", "format",
                    "width", "height", "phash",
                ],
            )

    return refs_df.select(F.col(ref_col)).mapInPandas(run, MEDIA_META)


def document_media_features(documents_df: DataFrame) -> DataFrame:
    """Span documents → per-asset media features: explode media spans,
    first-wins dedup per ref (one fetch per asset), feature extraction."""
    from pyspark.sql import Window

    refs = (
        documents_df.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
    )
    w = Window.partitionBy("media_ref").orderBy(F.lit(1))
    uniq = (
        refs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return media_features(uniq)
