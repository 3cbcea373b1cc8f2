"""Streaming sources: a file-stream of request rows (the Iceberg-stream
stand-in available in this sandbox) plus the explicit schema it needs.

At production scale this is `spark.readStream.format("iceberg")` with
`maxFilesPerTrigger`/`maxOffsetsPerTrigger` as the admission backpressure
(the semaphore analog, reference: service.rs:284-289); everything
downstream is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

REQUEST_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("source", StringType()),
        StructField("n_tok", IntegerType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("ts", TimestampType()),
        StructField("ops", StringType()),
        StructField("sig", StringType()),
        StructField("orientation", IntegerType()),
        StructField("src_dtype", StringType()),
    ]
)


def write_request_batches(
    requests: DataFrame, path: str, n_batches: int = 3, ts_step_s: int = 600
) -> None:
    """Materialize a request DataFrame as N parquet drops under `path`
    (one file-stream micro-batch each, replicas shifted in event time) —
    the test/bench stand-in for an arriving Iceberg stream."""
    for i in range(n_batches):
        batch = requests.withColumn(
            "ts", (F.unix_timestamp("ts") + i * ts_step_s).cast("timestamp")
        )
        batch.write.mode("overwrite" if False else "append").parquet(f"{path}/drop={i}")


def read_request_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = (
        spark.readStream.schema(REQUEST_SCHEMA)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)
