"""Benchmark decontamination (tokforge/pipeline/decontam.py): n-gram
construction, self-contamination of eval members, broadcast plan shape,
and a DuckDB mirror of the whole screen.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from tokforge.pipeline.decontam import decontaminate, q_decontaminate, word_ngrams_col
from tokforge.sources.requests import load_documents

N = 3
MIN_SHARED = 2
MOD = 97


def test_word_ngrams_construction(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("x y z",)], ["text"]
    ).select(word_ngrams_col(F.col("text"), N).alias("g"))
    got = [r["g"] for r in df.collect()]
    assert got == [["a b c", "b c d"], [], ["x y z"]]


def test_eval_members_are_self_contaminated(spark):
    """Every eval doc with >= min_shared distinct n-grams must be flagged
    when it also appears in training (it shares all its n-grams with
    itself)."""
    out = q_decontaminate(spark, SF_SMALL, N, MIN_SHARED, MOD)
    docs = load_documents(spark, SF_SMALL)
    rich_eval = {
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % MOD == 0)
        .select(
            "doc_id",
            F.size(F.array_distinct(word_ngrams_col(F.col("text"), N))).alias("k"),
        )
        .filter(F.col("k") >= MIN_SHARED)
        .collect()
    }
    assert rich_eval, "fixture eval set must be non-trivial"
    flagged = {r["doc_id"] for r in out.filter("contaminated").collect()}
    assert rich_eval <= flagged
    # and the screen is not degenerate: most of the corpus survives
    total = out.count()
    assert len(flagged) < total / 2


def test_counts_match_duckdb_oracle(spark):
    got = sorted(
        (r["doc_id"], r["shared_ngrams"], r["contaminated"])
        for r in q_decontaminate(spark, SF_SMALL, N, MIN_SHARED, MOD).collect()
    )
    con = duckdb.connect()
    want = sorted(
        (int(d), int(s), bool(c))
        for d, s, c in con.execute(
            f"""
        WITH tr AS (
          SELECT doc_id, string_split(text, ' ') AS ws
          FROM '{SF_SMALL}/documents.parquet'
        ),
        grams AS (
          SELECT DISTINCT doc_id, array_to_string(ws[i:i+{N - 1}], ' ') AS g
          FROM tr, UNNEST(range(1, len(ws) - {N - 2})) AS t(i)
          WHERE len(ws) >= {N}
        ),
        ev AS (
          SELECT DISTINCT g FROM grams WHERE doc_id % {MOD} = 0
        ),
        shared AS (
          SELECT doc_id, count(*) AS s
          FROM grams JOIN ev USING (g)
          GROUP BY doc_id
        )
        SELECT tr.doc_id,
               COALESCE(shared.s, 0) AS shared_ngrams,
               COALESCE(shared.s, 0) >= {MIN_SHARED} AS contaminated
        FROM tr LEFT JOIN shared USING (doc_id)
        """
        ).fetchall()
    )
    assert got == want


def test_eval_side_is_broadcast(spark):
    """The training corpus must never shuffle for the match: the eval
    n-gram set joins via BroadcastExchange."""
    docs = load_documents(spark, SF_SMALL)
    eval_df = docs.filter(F.col("doc_id") % MOD == 0)
    plan = (
        decontaminate(docs, eval_df, N, MIN_SHARED)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
