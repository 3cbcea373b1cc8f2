"""Sequence packing — assign documents to fixed-length training
sequences ("concat then chunk every L tokens", the GPT-style packing
that follows sampling/interleaving in a training-data pipeline).

The deliverable is the doc -> chunk MAP, not the materialized token
chunks: for each document, which training sequence its first token
lands in (``chunk_first``), which one its last token lands in
(``chunk_last``), and the offset of its first token inside that first
chunk.  Writers consume the map to emit chunk files; materializing the
chunks themselves is one partition-local pass over that map (tokens
never shuffle globally — each (chunk range) is contiguous in the
SAME deterministic order the map was computed in).

Semantics (mirrored in DuckDB by tests/test_pack.py):

* Documents are laid out per stratum in the deterministic md5 order
  shared with pipeline.sample/interleave; ``cum_before`` is the running
  token total before the doc.
* ``chunk_first = floor(cum_before / L)``,
  ``chunk_last = floor((cum_before + w - 1) / L)`` (a doc spanning a
  boundary continues into the next chunk — no padding, no discard),
  ``offset = cum_before % L``.

Scale shape: the running total is the SAME per-stratum prefix sum as
pipeline.sample — the bucketed form aggregates per (stratum, hex-prefix
bucket), windows over the tiny bucket table, broadcasts offsets back,
and finishes locally; no stratum ever sorts in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tokforge.pipeline.sample import _order_key, token_weight_col
from tokforge.sources.requests import load_documents


def _assign(d: DataFrame, cum_before, seq_len: int) -> DataFrame:
    return (
        d.withColumn("cum_before", cum_before)
        .withColumn("chunk_first", F.floor(F.col("cum_before") / seq_len))
        .withColumn(
            "chunk_last",
            F.floor((F.col("cum_before") + F.col("w") - 1) / seq_len),
        )
        .withColumn("offset", F.col("cum_before") % seq_len)
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    stratum_col: str = "lang",
    weight: "F.Column | None" = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reference implementation: one running-total window per stratum."""
    w = weight if weight is not None else token_weight_col()
    d = docs.withColumn("w", w).withColumn("__key", _order_key(id_col))
    win = (
        Window.partitionBy(stratum_col)
        .orderBy("__key", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("w").over(win), F.lit(0))
    return _assign(d, cum_before, seq_len).drop("__key")


def pack_sequences_bucketed(
    docs: DataFrame,
    seq_len: int,
    stratum_col: str = "lang",
    weight: "F.Column | None" = None,
    id_col: str = "doc_id",
    prefix_len: int = 2,
) -> DataFrame:
    """Scale implementation: the hex-prefix bucket decomposition of the
    running total (see pipeline.sample).  Row-identical to
    ``pack_sequences`` for any prefix_len."""
    w = weight if weight is not None else token_weight_col()
    d = (
        docs.withColumn("w", w)
        .withColumn("__key", _order_key(id_col))
        .withColumn("__bucket", F.substring("__key", 1, prefix_len))
    )
    totals = d.groupBy(stratum_col, "__bucket").agg(F.sum("w").alias("__btotal"))
    off_win = (
        Window.partitionBy(stratum_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        stratum_col,
        "__bucket",
        F.coalesce(F.sum("__btotal").over(off_win), F.lit(0)).alias("__offset"),
    )
    local_win = (
        Window.partitionBy(stratum_col, "__bucket")
        .orderBy("__key", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.col("__offset") + F.coalesce(F.sum("w").over(local_win), F.lit(0))
    return _assign(
        d.join(F.broadcast(offsets), [stratum_col, "__bucket"]), cum_before, seq_len
    ).drop("__key", "__bucket", "__offset")


def q_pack(
    spark: SparkSession, sf_dir: str, seq_len: int = 256, bucketed: bool = False
) -> DataFrame:
    """Per-language packing map over the documents table (pytest-covered;
    the driver registry stays at the 50-query window)."""
    docs = load_documents(spark, sf_dir)
    fn = pack_sequences_bucketed if bucketed else pack_sequences
    return fn(docs, seq_len).select(
        "doc_id", "lang", "w", "cum_before", "chunk_first", "chunk_last", "offset"
    )
