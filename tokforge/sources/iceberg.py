"""Iceberg source/sink adapters — the production table format the engine
targets (north rule: "Iceberg tables of pre-tokenized training
sequences"), with a transparent parquet fallback for environments without
the Iceberg runtime jars (this sandbox).

Everything downstream of these readers is format-agnostic: the engine
consumes a DataFrame with the request schema, and the exactly-once sink's
batchId ledger is the same commit-if-absent recipe Iceberg's snapshot
commit provides natively (when Iceberg IS available the foreachBatch body
swaps the parquet write for `writeTo(table).append()` inside the same
ledger guard — idempotency semantics unchanged).

At 10^12-sequence scale the parts Iceberg supplies that the fallback
cannot are noted per function: split planning from manifest metadata,
hidden partitioning (e.g. `bucket(N, doc_id)`), snapshot isolation for
concurrent writers, and incremental scans for the streaming source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tokforge.streaming.source import REQUEST_SCHEMA


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable in this session."""
    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001 - any failure means no runtime jars
        return False


def read_token_table(spark: SparkSession, location: str) -> DataFrame:
    """Batch read of the pre-tokenized sequence table.

    `location` is either an Iceberg table identifier (catalog.db.table) or
    a parquet directory (fallback).  Iceberg adds: manifest-driven split
    planning (no file listing at 10^12 scale) and partition pruning on the
    hidden `bucket(doc_id)` / `days(ts)` transforms.
    """
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def read_token_stream(
    spark: SparkSession,
    location: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read.  Iceberg adds incremental snapshot scans (exactly
    the new files of each commit); the fallback is the schema-pinned file
    stream used throughout the tests."""
    if "/" not in location and iceberg_available(spark):
        reader = spark.readStream.format("iceberg")
        if max_files_per_trigger:
            reader = reader.option("streaming-max-files-per-micro-batch",
                                   str(max_files_per_trigger))
        return reader.load(location)
    reader = spark.readStream.schema(REQUEST_SCHEMA).option(
        "recursiveFileLookup", "true"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(location)


def write_token_table(df: DataFrame, location: str, mode: str = "append") -> None:
    """Batch write.  Iceberg adds snapshot-isolated commits (safe
    concurrent writers) and schema evolution; the fallback writes plain
    parquet."""
    if "/" not in location and iceberg_available(df.sparkSession):
        from pyspark.sql import functions as F

        writer = df.writeTo(location)
        if mode == "append":
            writer.append()
        elif mode == "overwrite":
            # replace the DATA, keep the table definition (partition spec,
            # properties, snapshot history stay; an unconditional overwrite
            # is Iceberg's truncate-then-append as one snapshot) — distinct
            # from createOrReplace, which drops and redefines the table
            writer.overwrite(F.lit(True))
        elif mode == "createOrReplace":
            writer.createOrReplace()
        else:
            # 'ignore'/'error' have no Iceberg writeTo equivalent here;
            # silently mapping them to createOrReplace would destroy data
            raise ValueError(f"Unsupported mode for Iceberg write: {mode}")
        return
    df.write.mode(mode).parquet(location)
