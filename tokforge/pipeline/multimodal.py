"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery — schema, partitioning, UDF signature, batch
shape — is real and tested; the actual media decode is STUBBED with a
deterministic fake (this container has no image/audio libraries).  Swap
``_decode_image_stub`` for a PIL/libvips call on a real cluster: the
dataflow does not change.

At 100 TB scale the important properties are already here:
- binary payloads never pass through Python row-at-a-time (Arrow batches),
- metadata travels in plain columns so filters prune BEFORE decode,
- decode parallelism is partition-level; `repartition` before mapInPandas
  controls the decode fan-out independent of file layout.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("decoded_bytes", LongType()),
        StructField("thumb_width", IntegerType()),
    ]
)

FEATURE_DIM = 16


def synthesize_media(spark: SparkSession, n_rows: int = 256) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes, metadata
    derived from the id (no external data; FIXTURES.md model)."""
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("media_id"),
            F.when(F.col("id") % 3 == 0, "image")
            .when(F.col("id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("kind"),
            F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
            (32 + (F.col("id") % 8) * 16).cast("int").alias("width"),
            (32 + (F.col("id") % 5) * 16).cast("int").alias("height"),
            (1 + (F.col("id") % 4) * 10).cast("int").alias("n_frames"),
        )
    )


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: a real deployment decodes `payload` with PIL/libvips here.
    The fake produces a deterministic pseudo-pixel buffer from the bytes so
    downstream feature extraction is testable."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**31)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def extract_features(df: DataFrame, target_width: int = 16) -> DataFrame:
    """decode -> resize (nearest) -> pooled feature vector, one Arrow batch
    at a time via mapInPandas."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes, widths = [], [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                pixels = _decode_image_stub(bytes(payload), int(w), int(h))
                # nearest-neighbour thumbnail, then column-mean pooling
                idx = (np.arange(target_width) * pixels.shape[1]) // target_width
                thumb = pixels[:, idx]
                pooled = thumb.mean(axis=0).astype(np.float32)
                feats.append(pooled[:FEATURE_DIM])
                sizes.append(int(pixels.nbytes))
                widths.append(target_width)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "decoded_bytes": sizes,
                    "thumb_width": widths,
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_k: int = 10) -> DataFrame:
    """Video frame sampling plan: explode frame indices JVM-side (no decode
    until a downstream consumer needs the pixels)."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
        ).alias("frame_idx"),
    )


# ---------------------------------------------------------------------------
# Driver-gated queries
# ---------------------------------------------------------------------------

_N_MEDIA = 256
_EVERY_K = 10


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan over the deterministic media table (sf_dir
    unused — media is synthesized, FIXTURES.md model).  Pure JVM column
    algebra, fully oracle-checkable."""
    return frame_sample(synthesize_media(spark, _N_MEDIA), _EVERY_K)


SQL_FRAME_SAMPLE = f"""WITH media AS (
  SELECT range AS media_id,
         CASE range % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(1 + (range % 4) * 10 AS INTEGER) AS n_frames
  FROM range({_N_MEDIA})
)
SELECT media_id, CAST(f AS INTEGER) AS frame_idx
FROM media, unnest(range(0, n_frames, {_EVERY_K})) AS u(f)
WHERE kind = 'video'"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real decode->resize->pool path through mapInPandas over binary
    payloads.  The decode stub is seeded-RNG (not SQL-expressible), so this
    query is registered WITHOUT an oracle — the driver records the weaker
    rows-only check; pytest (test_multimodal) pins the values.  Output is
    scalar-only (feature digested) so the canonicalizer can sort it."""
    feats = extract_features(synthesize_media(spark, _N_MEDIA))
    digest = F.md5(
        F.concat_ws(
            ",", F.transform(F.col("feature"), lambda x: F.round(x, 3)).cast("array<string>")
        )
    )
    return feats.select(
        "media_id", "kind", digest.alias("feature_md5"), "decoded_bytes", "thumb_width"
    )


MULTIMODAL_QUERIES = {
    # (spark_fn, oracle_sql_or_None) — None => rows-only driver check
    "multimodal_frame_sample": (q_frame_sample, SQL_FRAME_SAMPLE),
    "multimodal_features": (q_multimodal_features, None),
}
