"""Salted repartition / two-phase agg: correctness (exact same results as
the naive agg) and skew-spreading (the hot key really lands in multiple
partitions)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tokforge.engine.skew import salted_agg, salted_repartition


def _skewed_df(spark, n=10_000):
    # ~70% of rows share one hot source (FIXTURES.md skew model)
    return spark.range(n).select(
        F.col("id").cast("string").alias("doc_id"),
        F.when(F.col("id") % 10 < 7, "web")
        .otherwise(F.concat(F.lit("src"), (F.col("id") % 10).cast("string")))
        .alias("source"),
        (F.col("id") % 97).alias("n_tok"),
    )


def test_salted_agg_matches_naive(spark):
    df = _skewed_df(spark)
    naive = {
        r["source"]: (r["n"], r["s"], r["mx"])
        for r in df.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_tok").alias("s"), F.max("n_tok").alias("mx"))
        .collect()
    }
    salted = {
        r["source"]: (r["n"], r["s"], r["mx"])
        for r in salted_agg(
            df,
            "source",
            [("n_tok", "count", "n"), ("n_tok", "sum", "s"), ("n_tok", "max", "mx")],
            buckets=8,
        ).collect()
    }
    assert naive == salted


def test_salted_repartition_spreads_hot_key(spark):
    df = _skewed_df(spark)
    out = salted_repartition(df, "source", buckets=8, num_partitions=16)
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .filter(F.col("source") == "web")
        .select("pid")
        .distinct()
        .count()
    )
    assert parts >= 4  # the hot key occupies several partitions, not one


def test_salted_repartition_preserves_rows(spark):
    df = _skewed_df(spark, 1000)
    out = salted_repartition(df, "source", buckets=4, num_partitions=8)
    assert out.count() == 1000
    assert "_salt" not in out.columns


def test_lsh_band_join_skew_split_in_executed_plan(spark):
    """The ACTUAL LSH hot path under structural skew: 30% of docs share
    one signature (every band bucket of theirs holds 30% of the corpus on
    BOTH sides of the self-join).  Salting cannot fix a self-joined hot
    key; AQE's skew-join split is the designed mitigation — this pins
    `skew=true` on the executed SortMergeJoin so no single task owns the
    whole bucket, plus the exact pair count vs an independent in-test
    Python mirror of the banding math.

    Two execution details this test encodes (both found the hard way):

    - Shuffle byte statistics are LZ4-COMPRESSED: `str(id)` doc_ids with
      an identical hot signature compress to under any sane threshold and
      skew is never detected.  The doc_ids here are md5-derived decimal
      strings (castable to long for the pair-order predicate) so the hot
      partition's bytes reflect its row count — which is also the honest
      model of real corpora, whose doc ids are high-entropy.
    - The plan must be read from the SAME QueryExecution that ran:
      `.count()`/re-collect build a fresh Dataset whose AQE plan never
      finalizes.  The count is therefore folded INTO the measured plan as
      an aggregate and collected once."""
    import hashlib

    import numpy as np

    from tokforge.pipeline.dedup import N_BANDS, P, ROWS_PER_BAND, band_pairs

    N, HOT = 6000, 1800  # 30% hot
    doc_id = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 14), 16, 10)
    sig = spark.range(N).select(
        doc_id.alias("doc_id"),
        F.when(F.col("id") < HOT, F.array(*[F.lit(7).cast("long")] * 8))
        .otherwise(
            F.array(*[(F.col("id") * 97 + j).cast("long") for j in range(8)])
        )
        .alias("sig"),
    )

    # independent oracle: same banding fold in numpy, pair set over the
    # union of band buckets (catches accidental background collisions too)
    ids = np.arange(N, dtype=np.int64)
    docnum = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:14], 16) for i in ids],
        dtype=np.int64,
    )
    sigs = np.where(
        (ids < HOT)[:, None],
        np.full((N, 8), 7, dtype=np.int64),
        ids[:, None] * 97 + np.arange(8, dtype=np.int64)[None, :],
    )
    pair_set = set()
    for b in range(N_BANDS):
        v = sigs[:, ROWS_PER_BAND * b].copy()
        for j in range(1, ROWS_PER_BAND):
            v = (v * 31 + sigs[:, ROWS_PER_BAND * b + j]) % P
        buckets: dict[int, list[int]] = {}
        for i in range(N):
            buckets.setdefault(int(v[i]), []).append(int(docnum[i]))
        for ds in buckets.values():
            ds = sorted(set(ds))
            for x in range(len(ds)):
                for y in range(x + 1, len(ds)):
                    pair_set.add((ds[x], ds[y]))
    expected = len(pair_set)
    assert expected >= HOT * (HOT - 1) // 2  # the hot block is all pairs

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.shuffle.partitions", "32")
        # test-scale thresholds (defaults target 256MB partitions)
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")

        res = band_pairs(sig).agg(F.count("*").alias("n"))
        assert res.collect()[0]["n"] == expected

        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:1000]
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)
