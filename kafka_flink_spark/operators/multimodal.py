"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The Spark-side machinery here is real and tested — schemas, binary
columns, ``mapInPandas`` batch shape, deterministic partitioning — but
the actual media decoding is STUBBED (this environment has no
image/audio libraries): ``decode_media`` with ``real=True`` raises
``NotImplementedError``; the default path runs a deterministic fake
decoder (md5-derived dimensions) so the dataflow is exercisable and
oracle-checkable end-to-end.

Scale design: blobs never shuffle — every stage is ``mapInPandas``
(narrow, pipelined with the scan); Arrow moves each batch to Python
once. Metadata-only queries select typed columns so Parquet column
pruning skips blob bytes entirely.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

# A multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("source", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def blobs_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a multimodal table from the documents fixture: the text
    payload stands in for media bytes (deterministic, so tests and
    oracles reproduce it)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        F.col("source"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a media decoder: md5-derived
    dimensions. Replace with PIL/ffmpeg in a real deployment."""
    d = hashlib.md5(payload).digest()
    return d[0] + 1, d[1] + 1, d[2] % 10 + 1  # width, height, n_frames


def decode_media(media: DataFrame, real: bool = False) -> DataFrame:
    """Decode media metadata via ``mapInPandas`` (Arrow batches; blobs
    cross to Python once, narrow plan — no shuffle)."""
    if real:
        raise NotImplementedError(
            "real media decoding needs PIL/av/soundfile, not present in "
            "this environment — the Spark plumbing below is the product"
        )

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = pdf["payload"].map(_fake_decode)
            yield pdf.assign(
                width=decoded.map(lambda t: t[0]),
                height=decoded.map(lambda t: t[1]),
                n_frames=decoded.map(lambda t: t[2]),
            )[["media_id", "media_type", "n_bytes", "width", "height", "n_frames"]]

    return media.mapInPandas(decode, DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("frame_fp", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for video blobs: one output row per sampled
    frame (1-to-N mapInPandas, the explode-shaped UDF pattern). Frame
    fingerprints are md5(payload + frame index) — stub for real frame
    extraction, deterministic for tests."""

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                if row["media_type"] != "video":
                    continue
                n = _fake_decode(row["payload"])[2]
                for f in range(0, n, every_k):
                    fp = hashlib.md5(row["payload"] + str(f).encode()).hexdigest()
                    out.append((row["media_id"], f, fp))
            yield pd.DataFrame(out, columns=["media_id", "frame_id", "frame_fp"])

    return media.mapInPandas(frames, FRAME_SCHEMA)


EMBED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def embed_media(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction stub: md5-derived unit-scale features via a
    vectorized Pandas UDF path. Swap ``_fake_decode``-style hashing for
    a real encoder; the batch shape and schema stay identical."""

    def embed(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            vecs = pdf["payload"].map(
                lambda b: [x / 255.0 for x in hashlib.md5(b).digest()[:dim]]
            )
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": vecs})

    return media.mapInPandas(embed, EMBED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized_fp", T.StringType()),
    ]
)


def resize_media(decoded: DataFrame, max_dim: int = 64, real: bool = False) -> DataFrame:
    """Fit-resize plumbing via ``mapInPandas``: aspect-preserving
    integer target dims (``new = dim * max_dim // longest_side``,
    floor — no float rounding to disagree across engines) plus a
    deterministic fingerprint of the would-be resized payload
    (md5 of ``media_id:WxH``; a real pixel resample is the gated
    ``real=True`` path, needing PIL which this environment lacks).

    Input is the decode_media output (media_id, width, height, ...);
    the batch shape, Arrow transfer, and output schema are the
    product — swapping the stub for PIL's ``Image.resize`` changes
    only the function body. Narrow plan, no shuffle.
    """
    if real:
        raise NotImplementedError(
            "real pixel resampling needs PIL, not present in this "
            "environment — the Spark plumbing below is the product"
        )

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            longest = pdf[["width", "height"]].max(axis=1)
            scale_needed = longest > max_dim
            ow = pdf["width"].where(
                ~scale_needed, (pdf["width"] * max_dim // longest).clip(lower=1)
            )
            oh = pdf["height"].where(
                ~scale_needed, (pdf["height"] * max_dim // longest).clip(lower=1)
            )
            fp = [
                hashlib.md5(f"{m}:{w}x{h}".encode()).hexdigest()
                for m, w, h in zip(pdf["media_id"], ow, oh)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_width": ow.astype("int32"),
                    "out_height": oh.astype("int32"),
                    "resized_fp": fp,
                }
            )

    return decoded.mapInPandas(resize, RESIZED_SCHEMA)
