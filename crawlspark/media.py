"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` stages.

The decode step is STUBBED (this container ships no image/audio codecs):
``decode_image`` produces a deterministic fake decode derived from the
bytes (so pipelines are testable end-to-end), and raises
``NotImplementedError`` in strict mode where a real deployment would call
PIL/ffmpeg. Everything around the stub — schemas, batch shapes, UDF
signatures, partitioning — is real and tested: swapping in a real codec
changes one function body.

Span documents carry media as ``media_ref``; this module is the stage
that would dereference those refs into bytes (a storage join) and extract
features for training-data filtering.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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


def fake_media_bytes(ref: str) -> bytes:
    """Deterministic stand-in for fetched media content (seeded by ref)."""
    h = hashlib.sha256(ref.encode()).digest()
    return h * 8  # 256 bytes, deterministic


def decode_image(content: bytes, strict: bool = False):
    """STUB decode. strict=True is the real-deployment path:

    raise NotImplementedError — wire PIL.Image.open(io.BytesIO(content))
    here when a codec is available.

    The fake decode derives (width, height, phash) deterministically from
    the bytes so downstream grouping/filtering logic is exercised."""
    if strict:
        raise NotImplementedError("no image codec in this environment")
    if content is None or len(content) == 0:
        return None
    w = 16 + content[0] % 64
    h = 16 + content[1] % 64
    phash = hashlib.md5(content[:32]).hexdigest()[:16]
    return w, h, phash


def media_features(refs_df: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """media_ref rows → MEDIA_META rows via one Arrow pass: 'fetch' bytes
    (deterministic fake resolver — same seam as the page resolver), sniff
    format from the ref suffix, stub-decode dimensions + perceptual hash.

    Scale: repartition upstream by xxhash64(media_ref) (dedup fetches of
    the same asset with a first-wins window, exactly like URL dedup)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf[ref_col]:
                content = fake_media_bytes(ref)
                fmt = ref.rsplit(".", 1)[-1].lower() if "." in ref else "bin"
                decoded = decode_image(content)
                w, h, ph = decoded if decoded else (None, None, None)
                rows.append(
                    {
                        "media_ref": ref,
                        "content": content,
                        "n_bytes": len(content),
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "phash": ph,
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
