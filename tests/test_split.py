"""Deterministic hash split (pipeline/sample.py hash_split): DuckDB
mirror equality, balance, partition-independence, salt independence,
and the 0/1 edges.
"""

from __future__ import annotations

import duckdb
import pytest
import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from tokforge.pipeline.sample import hash_split, sql_hash_split
from tokforge.sources.requests import load_documents

FRAC = 0.25


def _assign(df):
    return {r["doc_id"]: r["split"] for r in df.select("doc_id", "split").collect()}


def test_matches_duckdb_mirror(spark):
    docs = load_documents(spark, SF_SMALL)
    got = _assign(hash_split(docs, FRAC))
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"""SELECT doc_id, {sql_hash_split(FRAC)} AS split
FROM '{SF_SMALL}/documents.parquet'"""
        ).fetchall()
    )
    assert got == want


def test_balance_and_stratum_balance(spark):
    docs = load_documents(spark, SF_SMALL)
    out = hash_split(docs, FRAC)
    n = docs.count()
    n_val = out.filter("split = 'val'").count()
    # binomial(500, 0.25): 5 sigma ~ 48
    assert abs(n_val - FRAC * n) < 50, n_val
    per_lang = {
        r["lang"]: r["v"] / r["n"]
        for r in out.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("v"),
        )
        .collect()
    }
    assert all(0.05 < frac < 0.5 for frac in per_lang.values()), per_lang


def test_partition_and_salt_independence(spark):
    docs = load_documents(spark, SF_SMALL)
    a = _assign(hash_split(docs, FRAC))
    b = _assign(hash_split(docs.repartition(13), FRAC))
    assert a == b, "split is a pure function of the id"
    c = _assign(hash_split(docs, FRAC, salt="epoch2"))
    assert a != c, "a new salt draws a different split"
    # both salts keep roughly the same share
    assert abs(sum(v == "val" for v in c.values()) - FRAC * len(c)) < 50


def test_edges(spark):
    docs = load_documents(spark, SF_SMALL)
    assert set(_assign(hash_split(docs, 0.0)).values()) == {"train"}
    assert set(_assign(hash_split(docs, 1.0)).values()) == {"val"}
    with pytest.raises(ValueError):
        hash_split(docs, 1.5)