"""Row-identity of the Arrow knn fast path vs the HOF-expression
reference (round-8 optimization: the interpreted `aggregate`/`zip_with`
cosine moved into numpy with the identical IEEE fold order; round(.,4)
stays JVM-side on the bit-identical double)."""

import pyspark.sql.functions as F
import pytest

from tokforge.pipeline.similarity import (
    N_QUERIES,
    TOP_K,
    knn_bruteforce,
    knn_bruteforce_reference,
)
from tokforge.sources.requests import load_embeddings

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("sf", [SF_SMALL, SF_MED])
def test_arrow_knn_matches_reference_on_fixtures(spark, sf):
    emb = load_embeddings(spark, sf)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    assert _rows(knn_bruteforce(emb, queries, TOP_K)) == _rows(
        knn_bruteforce_reference(emb, queries, TOP_K)
    )


def _edge_corpus(spark):
    """Ragged lengths, a null embedding, exact ties, and a corpus smaller
    than k for one length class.  (No zero vector: under Spark 4 ANSI
    mode the HOF reference RAISES on the 0/0 division, so zero-norm
    robustness is pinned separately below.)"""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),          # exact tie with vec 2
        (2, [1.0, 0.0, 0.0]),
        (4, [0.5, 0.5]),               # length mismatch -> NULL cosine
        (5, None),                     # null embedding -> NULL cosine
        (6, [-1.0, 2.0, 0.25]),
        (7, [0.25, -0.125, 3.0]),
        (8, [1.0, 1.0, 1.0, 1.0]),     # another length class
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_arrow_knn_survives_zero_norm(spark):
    """Deliberate robustness difference vs the reference: a zero-norm
    vector yields a NaN/Inf cosine (numpy IEEE semantics) instead of an
    ANSI DIVIDE_BY_ZERO error; NaN sorts above every double, matching
    Spark's sort rule for whatever NaNs reach the rank stage."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    rows = knn_bruteforce(emb, queries, 2).collect()
    assert {r["vec_id"] for r in rows} == {1, 2}


def test_arrow_knn_matches_reference_on_edge_corpus(spark):
    emb = _edge_corpus(spark)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    for k in (1, 3, 20):
        assert _rows(knn_bruteforce(emb, queries, k)) == _rows(
            knn_bruteforce_reference(emb, queries, k)
        ), f"k={k}"


def test_arrow_knn_null_query_vector(spark):
    emb = _edge_corpus(spark)
    queries = spark.createDataFrame(
        [(99, None)], "qid long, qvec array<float>"
    )
    assert _rows(knn_bruteforce(emb, queries, 3)) == _rows(
        knn_bruteforce_reference(emb, queries, 3)
    )


def test_arrow_knn_query_cap(spark):
    from tokforge.pipeline.similarity import KNN_QUERY_CAP

    emb = _edge_corpus(spark)
    queries = (
        spark.range(KNN_QUERY_CAP + 1)
        .select(F.col("id").alias("qid"))
        .withColumn("qvec", F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)))
    )
    with pytest.raises(ValueError, match="cap"):
        knn_bruteforce(emb, queries, 1)
