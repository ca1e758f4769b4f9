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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_feature", T.ArrayType(T.FloatType())),
    ]
)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize kernel plumbing: Arrow-batched ``mapInPandas``, one row per
    input row, target dimensions attached; the pixel resample itself is
    stubbed (content passes through — a real kernel swaps in
    PIL.Image.resize on the decoded buffer). Narrow op: no shuffle,
    partitioning preserved."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": width,
                    "height": height,
                    "content": pdf["content"],  # stub: real kernel resamples
                }
            ).astype({"width": "int32", "height": "int32"})

    return df.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, max_frames: int = 4) -> DataFrame:
    """Frame sampling: 1 → N table-generating ``mapInPandas`` — each media
    row emits up to ``max_frames`` evenly-spaced frame rows with per-frame
    features (deterministic fake features; a real kernel decodes and
    samples actual frames). The output explodes rows but never shuffles.

    The fake per-frame digest is md5 over the STRING ``"<content-md5-hex>:
    <frame_no>"`` (not over raw bytes) so the stub is expressible in ANSI
    SQL and the whole pipeline stays oracle-checkable end to end."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, feats = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, _, n_frames, _ = _fake_decode(content)
                take = min(max_frames, n_frames)
                h = hashlib.md5(content or b"").hexdigest()
                for j in range(take):
                    # evenly spaced: frame j of take over n_frames total
                    frame_no = (j * n_frames) // max(take, 1)
                    d = hashlib.md5(f"{h}:{frame_no}".encode()).digest()
                    ids.append(mid)
                    idxs.append(frame_no)
                    feats.append([round(b / 255.0, 6) for b in d[:8]])
            out = pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_feature": feats}
            )
            out["media_id"] = out["media_id"].astype("int64")
            out["frame_idx"] = out["frame_idx"].astype("int32")
            yield out

    return df.mapInPandas(sample_batches, schema=FRAMES_SCHEMA)


def media_meta(df: DataFrame) -> DataFrame:
    """Metadata-only path (no decode): byte length etc. as pure column
    expressions — stays in codegen, oracle-checkable."""
    return df.select(
        "media_id",
        "mime",
        F.length("content").cast("bigint").alias("n_bytes"),
        F.md5("content").alias("content_hash"),
    )
