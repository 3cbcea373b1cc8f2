"""Skew handling for hot keys (north rule: explicit salted repartitioning
+ AQE-tuned shuffle).

The request stream is skewed by `source` (FIXTURES.md: ~70% of traffic
from one origin).  Two tools:

- :func:`salted_repartition` — spread a hot partition key over S salt
  buckets so no single reducer owns the hot key's rows (for per-key
  PROCESSING, e.g. the transform path partitioned by source).
- :func:`salted_agg` — two-phase aggregation: partial agg on
  (key, salt) then final agg on key.  The classic hot-key combine split;
  Spark's map-side partial aggregation handles commutative aggs
  automatically, this makes the pattern explicit for aggs that shuffle
  raw rows (e.g. collect_list, exact distinct).

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on by default in
build_spark) covers the join case at runtime; salting covers structural
skew known in advance.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(df_key: Column, buckets: int, entropy: Column) -> Column:
    """Deterministic salt in [0, buckets) mixing the partition key with a
    high-cardinality column (NOT random — replays must be byte-identical).
    Mixing the key keeps two distinct hot keys from landing their salt
    buckets on the same reducers."""
    return F.pmod(F.hash(df_key, entropy), F.lit(buckets))


def salted_repartition(
    df: DataFrame,
    key: str,
    buckets: int,
    entropy: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by (key, salt) so a hot key spreads over `buckets`
    partitions (reference analog: the worker semaphore kept one hot
    source from starving others, service.rs:284-289)."""
    salted = df.withColumn(
        "_salt", salt_col(F.col(key), buckets, F.col(entropy))
    )
    if num_partitions:
        out = salted.repartition(num_partitions, F.col(key), F.col("_salt"))
    else:
        out = salted.repartition(F.col(key), F.col("_salt"))
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: Sequence[tuple[str, str, str]],
    buckets: int,
    entropy: str = "doc_id",
) -> DataFrame:
    """Two-phase agg for hot keys: (key, salt) partial -> key final.

    ``aggs``: (input_col, fn, out_name) with fn in {count, sum, min, max}.
    The partial phase shuffles on (key, salt) — `buckets` reducers share
    the hot key — and the final phase only sees `buckets` rows per key.
    """
    salted = df.withColumn("_salt", salt_col(F.col(key), buckets, F.col(entropy)))
    partial_exprs = []
    final_exprs = []
    for col, fn, out in aggs:
        p = f"_p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"Unsupported salted agg fn: {fn}")
    partial = salted.groupBy(key, "_salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)
