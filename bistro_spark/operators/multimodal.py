"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched pandas UDFs over mapInPandas.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic pseudo-decoder (bytes →
seeded pseudo-pixel stats) stands in. Everything Spark-side — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested, so
swapping in PIL/ffmpeg on a real cluster is a one-function change.

Scale notes: mapInPandas streams Arrow batches (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch) so executor memory is
independent of partition size; binary payloads never pass through Python
row-at-a-time.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int, source string"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, mean_byte double, "
    "feat array<float>"
)


def synthetic_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic fake media table: payload = repeatable pseudo-bytes
    (pure function of media_id), metadata typed as a real pipeline's would
    be. Generated JVM-side."""
    i = F.col("id")
    payload = F.unhex(
        F.sha2(F.conv(i.cast("string"), 10, 16), 256)
    )  # 32 deterministic bytes per row
    return spark.range(n).select(
        i.alias("media_id"),
        F.when(i % 3 == 0, "image").when(i % 3 == 1, "audio").otherwise("video").alias("kind"),
        payload.alias("payload"),
        ((i % 16) * 64 + 64).cast("int").alias("width"),
        ((i % 9) * 64 + 64).cast("int").alias("height"),
        ((i % 30) * 1000).cast("int").alias("duration_ms"),
        F.concat(F.lit("shard_"), (i % 4).cast("string")).alias("source"),
    )


try:  # optional dependency — absent in the offline container
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - environment-dependent
    _PILImage = None


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    Real path: PIL (when installed) decodes the payload and converts to
    RGB. Offline (no PIL) and ``fake=False`` raises NotImplementedError;
    ``fake=True`` returns a deterministic pseudo-image derived from the
    payload bytes (for plumbing tests), PIL or not."""
    if not fake:
        if _PILImage is not None:
            import io

            return np.asarray(
                _PILImage.open(io.BytesIO(payload)).convert("RGB"),
                dtype=np.uint8,
            )
        raise NotImplementedError(
            "image decoding requires PIL/libjpeg — not available offline; "
            "pass fake=True for the deterministic stand-in"
        )
    rng = np.frombuffer(payload, dtype=np.uint8)
    side = 4
    reps = int(np.ceil(side * side * 3 / len(rng)))
    return np.tile(rng, reps)[: side * side * 3].reshape(side, side, 3)


def extract_features(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction: per Arrow batch, vectorized stats of
    each payload + a fixed-width pseudo-embedding from the (fake-)decoded
    pixels. Batch shape and schema are the real contract; only the decode
    internals are stand-ins."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = b["payload"]
            n_bytes = payloads.map(len).astype("int32")
            mean_byte = payloads.map(
                lambda p: float(np.frombuffer(p, dtype=np.uint8).mean())
            )
            feats = payloads.map(
                lambda p: decode_image(p, fake=fake_decode)
                .mean(axis=(0, 1))
                .astype(np.float32)
            )
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": n_bytes,
                    "mean_byte": mean_byte,
                    "feat": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (the decode of the actual frame is the stubbed step). The
    explode is JVM-side — the expensive fan-out never touches Python."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "payload", "width", "height")
    )
