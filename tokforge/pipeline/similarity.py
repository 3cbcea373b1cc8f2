"""Similarity search over the `embeddings` table (array<float>, dim 64):
brute-force cosine top-k as the exactness baseline, and an IVF-style
coarse-quantizer assignment as the scale path (probe one cell instead of
the whole corpus).

At 100 TB the brute-force path is a broadcast join (tiny query set against
a huge corpus — no shuffle of the corpus), and the IVF path turns top-k
into a per-cell local problem: shuffle once on cell id, search within.

Cosine math is done in DOUBLE with identical accumulation order on both
engines and rounded to 4 decimals so Spark and DuckDB hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tokforge.sources.requests import load_embeddings

N_QUERIES = 4  # vec_id < 4 act as the query set
TOP_K = 10
N_CELLS = 4  # IVF coarse cells = the query vectors as centroids


def _dot_spark(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_spark(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


_SQL_DOT = (
    "list_sum(list_transform(range(len({a})), "
    "i -> CAST({a}[i + 1] AS DOUBLE) * CAST({b}[i + 1] AS DOUBLE)))"
)
_SQL_NORM = (
    "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query vectors against the corpus,
    rank per query.  The corpus never shuffles; ranking is one window over
    (query, cos) — at scale replace row_number with a per-partition top-k
    + final merge, which AQE handles via partial aggregation."""
    emb = load_embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    corpus = emb.select("vec_id", "embedding")
    joined = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("qid")
    )
    cos = F.round(
        _dot_spark(F.col("qvec"), F.col("embedding"))
        / (_norm_spark(F.col("qvec")) * _norm_spark(F.col("embedding"))),
        4,
    )
    ranked = joined.select("qid", "vec_id", cos.alias("cos_sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.col("vec_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id", "cos_sim", "rank")
    )


def _sql_knn_bruteforce() -> str:
    dot = _SQL_DOT.format(a="q.embedding", b="c.embedding")
    nq = _SQL_NORM.format(a="q.embedding")
    nc = _SQL_NORM.format(a="c.embedding")
    return f"""WITH scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         round(({dot}) / (({nq}) * ({nc})), 4) AS cos_sim
  FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT qid, vec_id, cos_sim, rank FROM (
  SELECT qid, vec_id, cos_sim,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOP_K}"""


def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse assignment: each vector goes to the cell of its most
    similar centroid (centroids = the first N_CELLS vectors, broadcast).
    Downstream ANN probes only the query's cell."""
    emb = load_embeddings(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec")
    )
    scored = emb.select("vec_id", "embedding").crossJoin(F.broadcast(cents))
    cos = F.round(
        _dot_spark(F.col("cvec"), F.col("embedding"))
        / (_norm_spark(F.col("cvec")) * _norm_spark(F.col("embedding"))),
        4,
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.col("cell"))
    assigned = (
        scored.select("vec_id", "cell", cos.alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return assigned.groupBy("cell").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.avg("cos"), 4).alias("avg_cos_to_centroid"),
    )


def _sql_ivf_assign() -> str:
    dot = _SQL_DOT.format(a="q.embedding", b="c.embedding")
    nq = _SQL_NORM.format(a="q.embedding")
    nc = _SQL_NORM.format(a="c.embedding")
    return f"""WITH scored AS (
  SELECT c.vec_id AS vec_id, q.vec_id AS cell,
         round(({dot}) / (({nq}) * ({nc})), 4) AS cos
  FROM embeddings q JOIN embeddings c ON true
  WHERE q.vec_id < {N_CELLS}
), assigned AS (
  SELECT vec_id, cell, cos,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rk
  FROM scored
)
SELECT cell, count(*) AS n_vectors, round(avg(cos), 4) AS avg_cos_to_centroid
FROM assigned WHERE rk = 1
GROUP BY cell"""


NEAR_DUP_THRESHOLD = 0.35  # synthetic 64-d corpus: top ~0.1% of pairs
NEAR_DUP_BUCKETS = 8  # coarse sign-bucket on the first embedding dims


def _bucket_spark(vec) -> "F.Column":
    """Cheap blocking key: sign pattern of the first 3 dims (8 buckets).
    Near-identical vectors share signs, so candidate pairs stay within a
    bucket — the all-pairs join never happens."""
    b = F.lit(0)
    for i in range(3):
        b = b * 2 + F.when(F.element_at(vec, i + 1) >= 0, 1).otherwise(0)
    return b


_SQL_BUCKET = (
    "((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) * 4 + "
    "(CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END) * 2 + "
    "(CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END))"
)


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-bucket blocking, then
    exact cosine inside each bucket, keep pairs above the threshold."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", "embedding", _bucket_spark(F.col("embedding")).alias("bucket")
    )
    a, b = emb.alias("a"), emb.alias("b")
    cos = F.round(
        _dot_spark(F.col("a.embedding"), F.col("b.embedding"))
        / (_norm_spark(F.col("a.embedding")) * _norm_spark(F.col("b.embedding"))),
        4,
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= NEAR_DUP_THRESHOLD)
    )


def _sql_embed_near_dup() -> str:
    dot = _SQL_DOT.format(a="a.embedding", b="b.embedding")
    na = _SQL_NORM.format(a="a.embedding")
    nb = _SQL_NORM.format(a="b.embedding")
    return f"""WITH bucketed AS (
  SELECT vec_id, embedding, {_SQL_BUCKET} AS bucket FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(({dot}) / (({na}) * ({nb})), 4) AS cos_sim
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(({dot}) / (({na}) * ({nb})), 4) >= {NEAR_DUP_THRESHOLD}"""


SIMILARITY_QUERIES = {
    "knn_bruteforce": (q_knn_bruteforce, _sql_knn_bruteforce()),
    "ann_ivf_assign": (q_ivf_assign, _sql_ivf_assign()),
    "embed_near_dup": (q_embed_near_dup, _sql_embed_near_dup()),
}
