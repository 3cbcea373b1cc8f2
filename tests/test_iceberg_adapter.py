"""Iceberg adapter: in this sandbox (no Iceberg jars) every entry point
must fall back to parquet transparently; the availability probe must say
so honestly."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from tokforge.sources.iceberg import (
    iceberg_available,
    read_token_stream,
    read_token_table,
    write_token_table,
)
from tokforge.sources.requests import requests_df


def test_availability_probe(spark):
    # sandbox truth: no Iceberg runtime jars
    assert iceberg_available(spark) is False


def test_batch_roundtrip_fallback(spark, tmp_path):
    req = requests_df(spark, SF_SMALL, "raw").limit(25)
    loc = str(tmp_path / "tbl")
    write_token_table(req, loc)
    back = read_token_table(spark, loc)
    assert back.count() == 25
    assert set(back.columns) == set(req.columns)


def test_stream_fallback_reads_schema(spark, tmp_path):
    from tokforge.engine.config import EngineConfig
    from tokforge.engine.transform import make_sign_udf

    req = requests_df(spark, SF_SMALL, "raw").limit(10)
    sign = make_sign_udf(EngineConfig())
    req = req.withColumn("sig", sign(F.col("ops"), F.col("doc_id")))
    loc = str(tmp_path / "stream")
    req.write.parquet(f"{loc}/drop=0")
    stream = read_token_stream(spark, loc, max_files_per_trigger=1)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("icetest")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) FROM icetest").collect()[0][0] == 10
