"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns exactly like the
PDF bytes do. The decode step is STUBBED (no image/audio libraries in
this container) behind ``decode_image`` raising NotImplementedError and a
deterministic fake decoder used by tests — but the Spark-side plumbing
(schema, Arrow batch shape, mapInPandas signature, partitioning) is real
and exercised.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media", BinaryType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("checksum", StringType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real decode needs an imaging library not present in this runtime.
    The Spark plumbing around it is fully tested with the deterministic
    fake below."""
    raise NotImplementedError(
        "image decode requires an imaging library unavailable in this "
        "container; wire PIL/libvips here on a real cluster"
    )


def synth_media(documents: DataFrame) -> DataFrame:
    """Attach a deterministic fake binary payload per document (stands in
    for a decoded-at-ingest thumbnail / audio clip)."""
    payload = F.sha2(F.col("text"), 256).cast("binary")
    return documents.select(
        "doc_id",
        payload.alias("media"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/fake")).otherwise(
            F.lit("audio/fake")
        ).alias("media_type"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    import numpy as np

    for b in batches:
        rows = []
        for doc_id, media, mtype in zip(b["doc_id"], b["media"], b["media_type"]):
            data = bytes(media)
            arr = np.frombuffer(data, dtype=np.uint8)
            rows.append(
                (
                    int(doc_id),
                    mtype,
                    len(data),
                    round(float(arr.mean()), 4) if len(arr) else 0.0,
                    hashlib.md5(data).hexdigest(),
                )
            )
        yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column — the same
    batch shape a real decode/resize/frame-sample UDF uses."""
    return media.mapInPandas(_feature_batches, FEATURE_SCHEMA)
