"""Multimodal columns (§2.2 extension): image/audio/video as opaque
``binary`` columns + typed metadata structs.

The decode/feature-extract step needs codec libraries not present in this
environment, so the *decode kernel* is stubbed (deterministic fake derived
from the content digest, or ``NotImplementedError`` in strict mode) while
the Spark-side plumbing is real and tested: binary schema, Arrow-batched
``mapInPandas``, per-batch vectorization, partition-preserving shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary(df: DataFrame, text_col: str, id_col: str,
                  mime: str = "application/octet-stream") -> DataFrame:
    """Make a media table from any string column: UTF-8 encode → binary
    content + typed metadata. Stands in for reading real image/audio blobs
    (at scale: parquet binary columns, or spark.read.format('binaryFile'))."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit(mime).alias("mime"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decoder (this container has no codec libs).

    Derives pseudo width/height/frames and an 8-dim feature from the raw
    bytes. Replace with PIL/ffmpeg decode in production.
    """
    if content is None:
        return 0, 0, 0, []
    import hashlib

    digest = hashlib.md5(content).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    n_frames = 1 + digest[2] % 8
    feature = [round(b / 255.0, 6) for b in digest[3:11]]
    return width, height, n_frames, feature


def decode_media(df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode/feature-extract via Arrow-batched ``mapInPandas``.

    Batch shape: whole Arrow record batches in, vectorized per-batch work,
    one output row per input row; partitioning is preserved (narrow op, no
    shuffle). ``strict=True`` raises NotImplementedError where the real
    codec would run.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires codec libraries (PIL/ffmpeg) "
                    "not available in this environment"
                )
            decoded = pdf["content"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["content"].map(
                        lambda b: 0 if b is None else len(b)
                    ).astype("int64"),
                    "width": decoded.map(lambda t: t[0]).astype("int32"),
                    "height": decoded.map(lambda t: t[1]).astype("int32"),
                    "n_frames": decoded.map(lambda t: t[2]).astype("int32"),
                    "feature": decoded.map(lambda t: t[3]),
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def media_meta(df: DataFrame) -> DataFrame:
    """Metadata-only path (no decode): byte length etc. as pure column
    expressions — stays in codegen, oracle-checkable."""
    return df.select(
        "media_id",
        "mime",
        F.length("content").cast("bigint").alias("n_bytes"),
        F.md5("content").alias("content_hash"),
    )
