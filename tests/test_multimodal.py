"""Multimodal plumbing: schema, Arrow batch shape, deterministic stub
decode, and the lazy frame-sampling plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from tokforge.pipeline.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample,
    synthesize_media,
)


def test_feature_extraction_schema_and_determinism(spark):
    media = synthesize_media(spark, 30)
    feats = extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 30
    for r in rows.values():
        assert len(r["feature"]) == FEATURE_DIM
        assert r["decoded_bytes"] > 0
    # deterministic: a second run yields identical features
    rows2 = {r["media_id"]: r for r in extract_features(media).collect()}
    for mid, r in rows.items():
        assert list(r["feature"]) == list(rows2[mid]["feature"])


def test_metadata_filter_prunes_before_decode(spark):
    media = synthesize_media(spark, 30)
    plan = extract_features(media.filter(F.col("width") > 64))._jdf.queryExecution().toString()
    # the width filter must sit below the Python map (scan-side pruning)
    assert "width" in plan


def test_decode_stub_matches_oracle_sql():
    """The integer-hash decode stub and SQL_MULTIMODAL_FEATURES must agree
    exactly — this is what makes the 50th driver row hash-checkable."""
    import hashlib

    import duckdb
    import numpy as np

    from tokforge.pipeline.multimodal import SQL_MULTIMODAL_FEATURES, _decode_image_stub

    rows = duckdb.sql(SQL_MULTIMODAL_FEATURES + " ORDER BY media_id").fetchall()
    assert len(rows) == 256
    for mid, _kind, fmd5, decoded, tw in rows[::17]:
        # Spark payload = sha2(id-string, 256) hex cast to binary (UTF-8)
        payload = hashlib.sha256(str(mid).encode()).hexdigest().encode()
        w, h = 32 + (mid % 8) * 16, 32 + (mid % 5) * 16
        px = _decode_image_stub(payload, w, h)
        idx = (np.arange(16) * w) // 16
        colsum = px[:, idx].sum(axis=0, dtype=np.int64)
        expect = hashlib.md5(",".join(str(int(x)) for x in colsum).encode()).hexdigest()
        assert (fmd5, decoded, tw) == (expect, w * h, 16)


def test_frame_sampling_plan(spark):
    media = synthesize_media(spark, 30)
    frames = frame_sample(media, every_k=10)
    rows = frames.collect()
    assert all(r["frame_idx"] % 10 == 0 for r in rows)
    videos = media.filter(F.col("kind") == "video").count()
    assert len(rows) >= videos  # at least frame 0 per video
