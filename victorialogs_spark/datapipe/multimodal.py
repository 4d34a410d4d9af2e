"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery — schemas, partitioning, UDF signatures, batch
shapes — is real and tested. The actual media decode is STUBBED (the
image/audio libraries are not in this container): ``decoder="fake"``
produces deterministic pseudo-features from the bytes so the pipeline is
end-to-end testable; ``decoder="pil"``/"ffmpeg" raise NotImplementedError
with the integration point documented.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic asset table from the documents table: the text
    bytes stand in for an opaque media payload (deterministic)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def _fake_decode(payload: bytes, modality: str, feat_dim: int) -> dict:
    """Deterministic pseudo-decode: stable dimensions/duration/features
    derived from the content hash. Stands in for PIL/ffmpeg decode."""
    h = hashlib.md5(payload or b"").digest()
    width = 64 + h[0] % 192 if modality == "image" else 0
    height = 64 + h[1] % 192 if modality == "image" else 0
    duration = 1000 + int.from_bytes(h[2:4], "big") if modality in ("audio", "video") else 0
    feat = [
        (int.from_bytes(h[(4 + 2 * i) % 16 : (4 + 2 * i) % 16 + 2] or b"\0\0", "big") % 1000)
        / 1000.0
        for i in range(feat_dim)
    ]
    return {
        "payload_bytes": len(payload or b""),
        "content_hash": hashlib.md5(payload or b"").hexdigest(),
        "width": width,
        "height": height,
        "duration_ms": duration,
        "feature": feat,
    }


def decode_features(
    assets: DataFrame, decoder: str = "fake", feat_dim: int = 8
) -> DataFrame:
    """Decode/feature-extract each asset via mapInPandas (Arrow batches).

    decoder="fake": deterministic stub (see _fake_decode).
    decoder="pil"/"ffmpeg": real decoders — NOT available in this
    container; raise with the integration point documented.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: real media decode needs PIL/ffmpeg, not "
            "present in this container. Plug the real decode into "
            "_decode_batches below — schema/batching stay identical."
        )

    def _decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for asset_id, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                d = _fake_decode(bytes(payload) if payload is not None else b"", modality, feat_dim)
                d["asset_id"] = asset_id
                d["modality"] = modality
                rows.append(d)
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return assets.mapInPandas(_decode_batches, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp.
    The decode of each frame is the stubbed step; the explode/plan shape
    (what a 100 TB video pipeline shuffles on) is real."""
    feats = decode_features(assets.where(F.col("modality") == "video"))
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return feats.select(
        "asset_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)
        ).alias("frame_ts_ms"),
    )
