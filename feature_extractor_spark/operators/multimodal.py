"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs. The
Spark side — schema, partitioning, Arrow batch shape, UDF signatures — is
real and tested; the actual codec work is stubbed (no image/audio libs in
this container): ``decode_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature vector
from the bytes (so pipelines and tests exercise the full dataflow).

At scale the mapInPandas stage is the right shape: each Arrow batch hands
the worker a contiguous block of binary payloads; batch size bounds memory
via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def synth_media(spark, n_rows: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table: payload = repeating byte pattern of
    the row id (binary column plumbing without any codec)."""
    return spark.range(n_rows).select(
        F.format_string("m_%06d", F.col("id")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.format_string("PAYLOAD:%012d", F.col("id")), "utf-8").alias(
            "payload"
        ),
        F.struct(
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_features(
    df: DataFrame,
    feature_dim: int = 8,
    fake: bool = False,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode + feature-extract stage over binary payloads via mapInPandas.

    Real decoders (PIL/librosa/ffmpeg) are NOT in this container: with
    ``fake=False`` the stage raises NotImplementedError at execution time
    (clearly-marked stub). With ``fake=True`` it emits a deterministic
    feature vector derived from sha256(payload) — full Arrow plumbing,
    stable across partitionings.
    """
    schema = T.StructType(
        [
            T.StructField(id_col, T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            feats = []
            for payload in pdf[payload_col]:
                digest = hashlib.sha256(bytes(payload)).digest()
                arr = np.frombuffer(digest[: feature_dim * 4], dtype=np.uint32)
                feats.append((arr.astype(np.float32) / np.float32(2**32)).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, schema)
