"""Request-stream synthesis: derive the `(doc_id, tokens, n_tok, source,
ts, ops, orientation, src_dtype)` request table (FIXTURES.md §1) from the
driver-provided `documents` parquet — deterministically, with pure integer
arithmetic, so the DuckDB oracle can reconstruct the exact same rows.

The derivation is defined ONCE here as constants + two renderers (a Spark
Column expression and a DuckDB SQL snippet) so the engine and the oracle
cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tokforge.constants import VOCAB

# Token derivation: tokens[i] = (doc_id * MUL_A + i * MUL_B) % VOCAB
MUL_A = 7919
MUL_B = 104729

# Sequence lengths cycle over these by doc_id % 4 (FIXTURES.md size ladder).
LEN_LADDER = (6, 32, 100, 256)

# Source dtypes cycle by doc_id % 3 (sniffed-format analog).
SRC_DTYPES = ("int32", "int16", "uint8")

EPOCH_TS = "2024-01-01 00:00:00"
TS_PERIOD_S = 7200  # requests spread over a 2h event-time span

# Replica doc_id stride for bench-scale row multiplication: a constant far
# above any real doc_id so replica id spaces never collide — NO driver-side
# count() inside plan construction (an action during planning blocks the
# driver and re-scans the source).
REPLICA_STRIDE = 1 << 33


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def n_tok_col(doc_id: Column) -> Column:
    c = doc_id % 4
    return (
        F.when(c == 0, LEN_LADDER[0])
        .when(c == 1, LEN_LADDER[1])
        .when(c == 2, LEN_LADDER[2])
        .otherwise(LEN_LADDER[3])
        .cast("int")
    )


def tokens_col(doc_id: Column, n_tok: Column) -> Column:
    return F.transform(
        F.sequence(F.lit(0).cast("long"), (n_tok - 1).cast("long")),
        lambda i: ((doc_id * MUL_A + i * MUL_B) % VOCAB).cast("int"),
    )


def _pin_utc(spark: SparkSession) -> None:
    """Event-time arithmetic (timestamp literals, unix_timestamp) must be
    replay-stable and oracle-comparable regardless of the caller's session
    timezone."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    _pin_utc(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    _pin_utc(spark)
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def requests_df(
    spark: SparkSession,
    sf_dir: str,
    ops: str,
    replicas: int = 1,
) -> DataFrame:
    """The request table for one fixed ops chain.

    ``replicas`` > 1 scales row volume for benchmarking (each replica gets a
    distinct doc_id continuing the id space, so token content still varies);
    correctness queries use replicas=1 so the oracle stays a simple SQL CTE.
    Only `doc_id`, `source` are read from parquet — column pruning keeps the
    scan minimal at scale.
    """
    docs = load_documents(spark, sf_dir).select("doc_id", "source")
    if replicas > 1:
        reps = spark.range(replicas).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("rep") * F.lit(REPLICA_STRIDE)).alias("doc_id"),
            "source",
        )
    d = F.col("doc_id")
    n = n_tok_col(d)
    return docs.select(
        d.cast("string").alias("doc_id"),
        F.col("source"),
        n.alias("n_tok"),
        tokens_col(d, n).alias("tokens"),
        F.expr(
            f"timestamp '{EPOCH_TS}' + make_interval(0, 0, 0, 0, 0, 0, doc_id % {TS_PERIOD_S})"
        ).alias("ts"),
        F.lit(ops).alias("ops"),
        (1 + d % 8).cast("int").alias("orientation"),
        F.when(d % 3 == 0, SRC_DTYPES[0])
        .when(d % 3 == 1, SRC_DTYPES[1])
        .otherwise(SRC_DTYPES[2])
        .alias("src_dtype"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle side — the same derivation as SQL text
# ---------------------------------------------------------------------------

SQL_N_TOK = (
    f"CAST(CASE doc_id % 4 WHEN 0 THEN {LEN_LADDER[0]} WHEN 1 THEN {LEN_LADDER[1]} "
    f"WHEN 2 THEN {LEN_LADDER[2]} ELSE {LEN_LADDER[3]} END AS INTEGER)"
)

SQL_TOKENS = (
    f"list_transform(range({SQL_N_TOK}), "
    f"i -> CAST((doc_id * {MUL_A} + i * {MUL_B}) % {VOCAB} AS INTEGER))"
)

SQL_ORIENTATION = "CAST(1 + doc_id % 8 AS INTEGER)"

SQL_SRC_DTYPE = (
    f"CASE doc_id % 3 WHEN 0 THEN '{SRC_DTYPES[0]}' WHEN 1 THEN '{SRC_DTYPES[1]}' "
    f"ELSE '{SRC_DTYPES[2]}' END"
)

SQL_TS = f"TIMESTAMP '{EPOCH_TS}' + (doc_id % {TS_PERIOD_S}) * INTERVAL 1 SECOND"


def sql_requests_cte() -> str:
    """`req` CTE over the pre-registered `documents` view: one row per doc
    with the same derived columns as :func:`requests_df`."""
    return f"""req AS (
  SELECT
    CAST(doc_id AS VARCHAR) AS doc_id,
    doc_id AS doc_num,
    source,
    {SQL_N_TOK} AS n_tok,
    {SQL_TOKENS} AS tokens,
    {SQL_TS} AS ts,
    {SQL_ORIENTATION} AS orientation,
    {SQL_SRC_DTYPE} AS src_dtype
  FROM documents
)"""
