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

def test_cross_split_leakage_planted_and_mirrored(spark):
    """Round 7 eval-hygiene op: exact dup and ORDER-PERMUTED near dup
    (SimHash is a bag vote, so a permutation collides at Hamming 0)
    planted across the split are flagged; clean val docs are not; and
    the whole op equals a composed DuckDB mirror on the real corpus."""
    import duckdb
    import pandas as pd

    from tokforge.pipeline.dedup import cross_split_leakage, sql_simhash_expr
    from tokforge.sources.requests import requests_df, sql_requests_cte

    rows = [
        ("t1", "train", [1, 2, 3, 4]),
        ("t2", "train", [5, 6, 7, 8]),
        ("v1", "val", [1, 2, 3, 4]),      # exact dup of t1
        ("v2", "val", [8, 7, 6, 5]),      # permutation of t2: near, not exact
        ("v3", "val", [101, 202, 303]),   # clean
    ]
    d = spark.createDataFrame(rows, "doc_id string, split string, tokens array<int>")
    got = {r["doc_id"]: (r["leak_exact"], r["leak_near"], r["leaked"])
           for r in cross_split_leakage(d).collect()}
    assert got["v1"] == (True, True, True)
    assert got["v2"] == (False, True, True)
    assert got["v3"] == (False, False, False)

    # engine equality on the real corpus + hash_split (composed mirror)
    req = requests_df(spark, SF_SMALL, "leak").select("doc_id", "tokens")
    split_df = hash_split(req, FRAC)
    got2 = sorted(
        tuple(r) for r in cross_split_leakage(split_df).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'"
    )
    want2 = sorted(
        tuple(r)
        for r in con.execute(
            f"""WITH {sql_requests_cte()},
s AS (
  SELECT doc_id, tokens, {sql_hash_split(FRAC)} AS split,
         md5(coalesce(array_to_string(tokens, ','), '')) AS dig,
         {sql_simhash_expr()} AS sh
  FROM req
),
dg AS (SELECT dig, max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) = 1 AS t
       FROM s GROUP BY dig),
sg AS (SELECT sh, max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) = 1 AS t
       FROM s GROUP BY sh)
SELECT s.doc_id, dg.t AS leak_exact, sg.t AS leak_near,
       dg.t OR sg.t AS leaked
FROM s JOIN dg USING (dig) JOIN sg ON sg.sh = s.sh
WHERE s.split = 'val'"""
        ).fetchall()
    )
    assert got2 == want2 and got2


def test_cross_split_leakage_fuzz_vs_python(spark):
    """Random small corpora with planted cross-split dups: the engine's
    leakage verdicts match a pure-python simhash/digest reference."""
    import random

    from tokforge.pipeline.dedup import (
        SIMHASH_BITS,
        SIMHASH_MOD,
        SIMHASH_MULT,
        cross_split_leakage,
    )

    def py_simhash(toks):
        h = 0
        for bit in range(SIMHASH_BITS):
            vote = sum(
                1 if ((x * SIMHASH_MULT) % SIMHASH_MOD >> bit) & 1 else -1
                for x in toks
            )
            if vote > 0:
                h += 1 << bit
        return h

    rng = random.Random(2024)
    rows = []
    for i in range(60):
        toks = [rng.randrange(6) for _ in range(rng.randrange(1, 12))]
        rows.append((f"d{i}", rng.choice(["train", "val"]), toks))
    # plant: exact dup and permuted dup across splits
    rows.append(("px", "train", [9, 8, 7, 6]))
    rows.append(("py", "val", [6, 7, 8, 9]))
    rows.append(("ex", "train", [11, 12, 13]))
    rows.append(("ey", "val", [11, 12, 13]))
    df = spark.createDataFrame(rows, "doc_id string, split string, tokens array<int>")
    got = {r["doc_id"]: (r["leak_exact"], r["leak_near"], r["leaked"])
           for r in cross_split_leakage(df).collect()}

    train_digs = {tuple(t) for d, s, t in rows if s == "train"}
    train_shs = {py_simhash(t) for d, s, t in rows if s == "train"}
    for d, s, t in rows:
        if s != "val":
            assert d not in got
            continue
        e = tuple(t) in train_digs
        n = py_simhash(t) in train_shs
        assert got[d] == (e, n, e or n), d
    assert got["py"] == (False, True, True)
    assert got["ey"] == (True, True, True)
