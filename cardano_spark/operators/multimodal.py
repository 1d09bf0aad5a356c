"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payload columns with a typed metadata
struct alongside; decode / feature-extract runs as Arrow-batched
``mapInPandas`` (the Spark-idiomatic shape for per-blob Python work
— one Python worker call per ~10k-row Arrow batch, never per row).

The actual codec step is STUBBED: the container has no image/audio
libraries, so :func:`decode_stub` raises ``NotImplementedError``
unless ``deterministic_fake=True``, in which case features are
computed from the raw bytes (length, md5, frame count) so the
Spark-side plumbing — schema, batching, partitioning — is fully
real and oracle-checkable.

Scale notes: payloads never pass through the driver; Arrow transfers
them batch-wise to Python workers. At 100 TB you'd store payloads in
parquet binary columns (or file paths + ``spark.read.format("binaryFile")``)
partitioned by media type so each task decodes one co-located batch.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: bytes per synthetic "frame" — stands in for a media codec's frame/
#: chunk structure so the fan-out shape (1 blob -> N frames) is real.
FRAME_BYTES = 256

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the multimodal layout from the documents table:
    an opaque binary payload (utf-8 bytes of the text — a stand-in
    for real media bytes) plus a typed metadata struct."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
            .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
            .otherwise(F.lit("video/mp4"))
            .alias("media_type"),
            F.octet_length(F.col(text_col)).alias("declared_bytes"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, media_type: str, deterministic_fake: bool):
    """Decode one media blob. Real decoding needs codec libraries not
    present in this environment; the deterministic fake derives
    features from the raw bytes instead."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decoding requires image/audio codec libraries; "
            "run with deterministic_fake=True for the plumbing path"
        )
    return {
        "n_bytes": len(payload),
        "n_frames": max(1, math.ceil(len(payload) / FRAME_BYTES)),
        "content_md5": hashlib.md5(payload).hexdigest(),
    }


def extract_features(df: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Feature extraction over the payload column via Arrow-batched
    ``mapInPandas``. Input: (doc_id, payload, meta); output:
    FEATURE_SCHEMA rows, one per blob."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, m, deterministic_fake)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.Series([f["n_bytes"] for f in feats], dtype="int64"),
                    "n_frames": pd.Series(
                        [f["n_frames"] for f in feats], dtype="int64"
                    ),
                    "content_md5": [f["content_md5"] for f in feats],
                }
            )

    flat = df.select("doc_id", "payload", F.col("meta.media_type").alias("media_type"))
    return flat.mapInPandas(run, FEATURE_SCHEMA)
