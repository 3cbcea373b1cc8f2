"""Token-budget stratified sampler (tokforge/pipeline/sample.py):
budget semantics, determinism under repartitioning, the bucketed scale
path row-identical to the global-window reference, and a DuckDB mirror
of the whole computation (same md5 order key, same crossing rule).
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from tokforge.pipeline.sample import (
    budget_sample,
    budget_sample_bucketed,
    q_budget_sample,
)
from tokforge.sources.requests import load_documents

BUDGET = 2000  # sf0.001 strata carry ~4k-10k tokens: budget binds everywhere


def _rows(df):
    return sorted(
        (r["doc_id"], r["lang"], r["w"], r["cum"])
        for r in df.select("doc_id", "lang", "w", "cum").collect()
    )


def test_budget_invariants(spark):
    docs = load_documents(spark, SF_SMALL)
    sample = budget_sample(docs, BUDGET)
    per = {
        r["lang"]: (r["tot"], r["mx"], r["n"])
        for r in sample.groupBy("lang")
        .agg(
            F.sum("w").alias("tot"),
            F.max("w").alias("mx"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    full = {
        r["lang"]: r["tot"]
        for r in docs.withColumn("w", F.size(F.split("text", " ")))
        .groupBy("lang")
        .agg(F.sum("w").alias("tot"))
        .collect()
    }
    assert set(per) == set(full), "every stratum is represented"
    for lang, (tot, mx, n) in per.items():
        assert tot >= min(BUDGET, full[lang]), (lang, tot)
        assert tot < BUDGET + mx, f"{lang}: overshoot beyond one document"
        assert n >= 1


def test_tiny_budget_keeps_first_document_only(spark):
    """budget=1: the crossing rule admits exactly the first document (in
    md5-key order) of every stratum — never an empty stratum."""
    docs = load_documents(spark, SF_SMALL)
    sample = budget_sample(docs, 1)
    counts = {r["lang"]: r["n"] for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n == 1 for n in counts.values()), counts
    assert len(counts) == 5


def test_deterministic_under_repartitioning(spark):
    docs = load_documents(spark, SF_SMALL)
    a = _rows(budget_sample(docs, BUDGET))
    b = _rows(budget_sample(docs.repartition(7, "doc_id"), BUDGET))
    assert a == b


def test_bucketed_equals_reference(spark):
    docs = load_documents(spark, SF_SMALL)
    ref = _rows(budget_sample(docs, BUDGET))
    for prefix_len in (1, 2):
        got = _rows(budget_sample_bucketed(docs, BUDGET, prefix_len=prefix_len))
        assert got == ref, f"prefix_len={prefix_len} diverges"


def test_matches_duckdb_oracle(spark):
    got = _rows(q_budget_sample(spark, SF_SMALL, BUDGET, bucketed=True))
    con = duckdb.connect()
    want = sorted(
        (int(d), l, int(w), int(c))
        for d, l, w, c in con.execute(
            f"""
        WITH d AS (
          SELECT doc_id, lang,
                 len(string_split(text, ' ')) AS w,
                 md5(CAST(doc_id AS VARCHAR)) AS k
          FROM '{SF_SMALL}/documents.parquet'
        ), c AS (
          SELECT doc_id, lang, w,
                 sum(w) OVER (PARTITION BY lang ORDER BY k, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
          FROM d
        )
        SELECT doc_id, lang, w, cum FROM c WHERE cum - w < {BUDGET}
        """
        ).fetchall()
    )
    assert got == want


def test_bucket_pruning_in_plan(spark):
    """The scale path must prune full buckets BEFORE the per-bucket sort:
    the offsets side carries a pushed filter on __offset < budget."""
    docs = load_documents(spark, SF_SMALL)
    plan = budget_sample_bucketed(docs, BUDGET)._jdf.queryExecution().toString()
    assert "__offset" in plan
    assert "BroadcastExchange" in plan or "Broadcast" in plan
