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
