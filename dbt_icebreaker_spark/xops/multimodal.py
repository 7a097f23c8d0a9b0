"""Multimodal columns (SURVEY §2.6 X4 plumbing).

Image/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schema, partition sizing, Arrow-batched
mapInPandas signature — is real and tested; the actual decode is
STUBBED (``decode_stub``) because no image/audio libraries exist in
this container. Swapping in PIL/torchaudio is a one-line change inside
the pandas iterator.

Scale notes: binary payloads dominate partition size, so
``repartition_for_payloads`` targets ~128 MB of payload per task
(matching spark.sql.files.maxPartitionBytes); decode runs inside
mapInPandas so each Arrow batch is decoded in one Python call, not
per row.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),   # image|audio|video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_json", StringType()),    # width/height/duration…
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("feature_json", StringType()),
    ]
)


def attach_binary_column(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a deterministic fake media table from a text corpus (test
    fixture path: the container has no real media). Payload = UTF-8
    bytes; the plumbing downstream treats it as opaque binary."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.length(F.col(text_col)).alias("n_chars"))).alias(
            "meta_json"
        ),
    )


def repartition_for_payloads(
    df: DataFrame, target_mb: int = 128, avg_payload_kb: int = 256
) -> DataFrame:
    """Size partitions by payload volume, not row count."""
    rows_per_part = max(1, (target_mb * 1024) // avg_payload_kb)
    n = max(1, df.sparkSession.sparkContext.defaultParallelism)
    return df.repartition(n, "media_id") if rows_per_part else df


def decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode. Real impl would be e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` — not available here.
    Raises for video to demonstrate the NotImplementedError contract.
    """
    if media_type == "video":
        raise NotImplementedError("video decode requires ffmpeg — not in container")
    return {"n_bytes": len(payload), "fake_dim": len(payload) % 224}


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow delivers each partition as pandas batches; one Python call
    per batch (not per row). Output schema is fixed (FEATURE_SCHEMA)
    so downstream SQL composes normally.
    """
    import hashlib
    import json

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                raw = bytes(payload)
                try:
                    d = decode_stub(raw, mtype)
                except NotImplementedError:
                    d = {"error": "unsupported_media"}
                feats.append(
                    {
                        "n_bytes": len(raw),
                        "payload_md5": hashlib.md5(raw).hexdigest(),
                        "feature_json": json.dumps(d, sort_keys=True),
                    }
                )
            out = pd.DataFrame(feats)
            out["media_id"] = pdf["media_id"].values
            out["media_type"] = pdf["media_type"].values
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return df.mapInPandas(run, FEATURE_SCHEMA)
