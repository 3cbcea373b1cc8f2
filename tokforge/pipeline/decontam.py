"""Benchmark decontamination — flag training documents that share word
n-grams with an evaluation set — the contamination-screening stage that
runs between dedup and corpus assembly in a training-data pipeline
(cf. the n-gram overlap screens described for GPT-3/PaLM/Llama data work).

Semantics (mirrored in DuckDB by tests/test_decontam.py):

* Both sides are cut into overlapping word n-grams (whitespace words,
  the same tokenization as pipeline.text's n_words); a document with
  fewer than n words contributes none.
* A training document's ``shared_ngrams`` is the number of its DISTINCT
  n-grams that occur anywhere in the eval set; ``contaminated`` is
  ``shared_ngrams >= min_shared``.

Scale shape (100 TB training corpus, eval sets are small by nature):

* The eval side collapses to DISTINCT n-grams and is BROADCAST — eval
  benchmarks are thousands of documents, i.e. MBs of n-grams; the
  training corpus never shuffles for the match.
* The train side is one narrow pass: n-gram expand (array_distinct
  before explode, so the per-doc count is a plain COUNT(*) — map-side
  combinable) -> broadcast hash join -> groupBy(doc_id).  The only
  shuffle is the final per-doc count, whose input is already reduced to
  matched n-grams only.
* The explode inflates rows ~n_words per doc but carries two narrow
  columns; no state, no window, no self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tokforge.sources.requests import load_documents


def word_ngrams_col(text_col: Column, n: int = 3) -> Column:
    """Overlapping word n-grams of `text` as an array<string> (1-based
    slice windows over the whitespace split; empty below n words)."""
    words = F.split(text_col, " ")
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    return F.when(
        F.size(words) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def _distinct_ngrams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        id_col,
        F.explode(F.array_distinct(word_ngrams_col(F.col(text_col), n))).alias("g"),
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Returns ``train`` + (shared_ngrams: long, contaminated: boolean);
    ``train.filter(~F.col('contaminated'))`` is the screened corpus."""
    eval_grams = (
        eval_df.select(F.explode(word_ngrams_col(F.col(text_col), n)).alias("g"))
        .distinct()
    )
    shared = (
        _distinct_ngrams(train, id_col, text_col, n)
        .join(F.broadcast(eval_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("shared_ngrams"))  # per-doc grams pre-distincted
    )
    return (
        train.join(shared, id_col, "left")
        .withColumn("shared_ngrams", F.coalesce("shared_ngrams", F.lit(0)).cast("long"))
        .withColumn("contaminated", F.col("shared_ngrams") >= F.lit(min_shared))
    )


def q_decontaminate(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    min_shared: int = 2,
    eval_modulus: int = 97,
) -> DataFrame:
    """Decontamination over the documents table against a deterministic
    synthetic eval set (doc_id % eval_modulus == 0 — stands in for a held
    benchmark; pytest-covered, the driver registry stays at the 50-query
    window)."""
    docs = load_documents(spark, sf_dir)
    eval_df = docs.filter(F.col("doc_id") % eval_modulus == 0)
    return decontaminate(docs, eval_df, n, min_shared).select(
        "doc_id", "source", "shared_ngrams", "contaminated"
    )
