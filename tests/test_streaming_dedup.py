"""Streaming dedup-at-ingest (tokforge/streaming/dedup.py):
``dropDuplicatesWithinWatermark`` keyed on the content hash — first-seen
content flows downstream, duplicates inside the watermark horizon are
dropped, and (the documented state-bound tradeoff) a duplicate arriving
AFTER the horizon is re-admitted.  Event time comes from the data;
availableNow triggers bound runtime.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from tokforge.sources.requests import requests_df
from tokforge.streaming.dedup import content_hash_col, dedup_stream
from tokforge.streaming.job import read_sink

CHAIN = "resize:fit:32/quality:80/format:int16"


def _feed(spark, limit=12):
    return requests_df(spark, SF_SMALL, CHAIN).limit(limit)


def _write_drop(df, path, i, shift_s):
    # coalesce(1): FIXTURE-ONLY — one file per drop so maxFilesPerTrigger=1
    # makes micro-batch boundaries == drops (deterministic watermark
    # advance).  Production never coalesces.
    df.withColumn(
        "ts", (F.unix_timestamp("ts") + shift_s).cast("timestamp")
    ).coalesce(1).write.mode("append").parquet(f"{path}/drop={i}")


def test_stream_dedup_drops_within_horizon(spark, tmp_path):
    """The same content arriving twice (10 min apart, well inside a 2 h
    horizon) is emitted once, and the kept row is the FIRST-seen one."""
    feed = _feed(spark)
    n = feed.count()
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    _write_drop(feed, in_dir, 0, 0)
    _write_drop(feed, in_dir, 1, 600)

    query, _ = dedup_stream(
        spark, in_dir, out_dir, ckpt, watermark="2 hours", max_files_per_trigger=1
    )
    query.awaitTermination(120)

    out = read_sink(spark, out_dir)
    rows = out.select("content_hash", "ts").collect()
    assert len(rows) == n, "each distinct content emitted exactly once"
    assert len({r["content_hash"] for r in rows}) == n
    # first-seen wins: every kept ts is from drop 0 (the un-shifted copies)
    first_ts = {r["ts"] for r in feed.select("ts").collect()}
    assert all(r["ts"] in first_ts for r in rows)


def test_stream_dedup_readmits_past_horizon(spark, tmp_path):
    """State is bounded by the horizon, not the corpus: a duplicate whose
    copies are separated by 4 h under a 5 min delay (with filler drops
    advancing the watermark in between) is admitted BOTH times — the
    documented tradeoff that pushes cross-horizon dedup to the batch
    layer.

    TWO filler batches are needed, not one: batch N evicts with the
    watermark computed from batch N-1's data, so the originals' state is
    released only at the end of the first batch AFTER the watermark-
    advancing one."""
    feed = _feed(spark, limit=6)
    dup = feed.limit(2)
    rest = feed.subtract(dup).orderBy("doc_id")
    filler_a, filler_b = rest.limit(2), rest.subtract(rest.limit(2))
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    _write_drop(dup, in_dir, 0, 0)
    _write_drop(filler_a, in_dir, 1, 7200)   # watermark -> t0 + 2h - 5min
    _write_drop(filler_b, in_dir, 2, 10800)  # eviction runs with that mark
    _write_drop(dup, in_dir, 3, 14400)       # far past the originals' horizon

    query, _ = dedup_stream(
        spark, in_dir, out_dir, ckpt, watermark="5 minutes", max_files_per_trigger=1
    )
    query.awaitTermination(120)

    out = read_sink(spark, out_dir)
    counts = {
        r["content_hash"]: r["cnt"]
        for r in out.groupBy("content_hash").agg(F.count("*").alias("cnt")).collect()
    }
    dup_hashes = {
        r["h"] for r in dup.select(content_hash_col().alias("h")).collect()
    }
    assert all(counts[h] == 2 for h in dup_hashes), counts
    assert sum(counts.values()) == 2 * 2 + 4  # dup twice, 4 fillers once


def test_stream_dedup_hash_matches_batch_key(spark):
    """The stream key is byte-identical to the batch exact-dedup key
    shape: md5 over the comma-joined token array."""
    feed = _feed(spark, limit=5)
    got = feed.select(content_hash_col().alias("h"), "tokens").collect()
    import hashlib

    for r in got:
        expect = hashlib.md5(
            ",".join(str(t) for t in r["tokens"]).encode()
        ).hexdigest()
        assert r["h"] == expect
