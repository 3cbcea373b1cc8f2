"""N-gram language-model perplexity scoring — the CCNet-style quality
signal: train a bigram LM on the corpus itself (or a reference corpus),
score every document by its per-token log-probability, and bucket the
corpus by perplexity.  Complements the surface heuristics in
pipeline/text.py (length/punct/stopwords) and the repetition/OOV
signals with a distributional one.

Model: add-1 (Laplace) bigram —
    p(b | a) = (c_ab + 1) / (c_a + V)
with V the vocabulary-size constant.  Unseen pairs and unseen history
degrade gracefully (c_ab = 0, c_a = 0 -> 1/V).

Engine-reproducible aggregation (the same trick as the exact IVF
trainer): each pair's log-probability quantizes ONCE to integer
micro-nats — ``lp_int = floor(ln((c_ab + 1) / (c_a + V)) * 10^6)`` —
computed from exact integer counts by one division + one libm log
(bit-identical in Spark, DuckDB and python), and the per-document score
is then an INTEGER SUM, independent of row order, partitioning and
engine.  A float sum of logs would be none of those.  The 1e-6 nat
quantization error is ~1e-6 per token — irrelevant against the
quality-bucket thresholds this feeds (whole nats apart).

Scale shape: counts reuse the pair_counts / token_frequencies passes
(Arrow partial aggregation, shuffle bounded by the observed vocabulary,
NOT the corpus); scoring is one explode of adjacent pairs (JVM
arrays_zip/slice — no Python), two hash LEFT joins against the count
tables on (a, b) / (a), and one map-side-combinable integer groupBy per
doc.  Nothing collects; the model "table" never leaves the cluster.

DuckDB mirror + pure-python reference in tests/test_lm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tokforge.constants import VOCAB
from tokforge.pipeline.bpe import pair_counts
from tokforge.pipeline.stats import token_frequencies
from tokforge.sources.requests import requests_df, sql_requests_cte

MICRO = 1_000_000


def _doc_pairs(req: DataFrame) -> DataFrame:
    """(doc_id, a, b) for every adjacent token pair — pure JVM column
    algebra (arrays_zip over two slices), no Python crossing."""
    t = F.col("tokens")
    # slice length must be >= 0 (an empty/1-token doc would pass -1)
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    z = F.arrays_zip(F.slice(t, 1, n1).alias("a"), F.slice(t, 2, n1).alias("b"))
    return (
        req.select(F.col("doc_id").cast("string").alias("doc_id"), t.alias("tokens"))
        .select("doc_id", F.explode(z).alias("p"))
        .select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )


def lm_score(req: DataFrame, vocab_size: int = VOCAB) -> DataFrame:
    """(doc_id, n_pairs, score_micronats, avg_logprob, ppl): add-1 bigram
    log-probability of each document under the corpus's own counts.
    ``ppl`` = exp(-avg_logprob), rounded to 4; single-token/empty docs
    carry n_pairs = 0 with NULL avg_logprob/ppl."""
    big = pair_counts(req).select(
        F.col("tok_a").alias("a"), F.col("tok_b").alias("b"),
        F.col("cnt").alias("c_ab"),
    )
    uni = token_frequencies(req).select(
        F.col("token").alias("a"), F.col("cnt").alias("c_a")
    )
    pairs = _doc_pairs(req)
    lp = F.floor(
        F.log(
            (F.coalesce("c_ab", F.lit(0)) + 1).cast("double")
            / (F.coalesce("c_a", F.lit(0)) + vocab_size).cast("double")
        )
        * MICRO
    ).cast("long")
    scored = (
        pairs.join(big, ["a", "b"], "left")
        .join(uni, "a", "left")
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("lp").alias("score_micronats"),
        )
    )
    base = req.select(F.col("doc_id").cast("string").alias("doc_id"))
    avg = F.col("score_micronats").cast("double") / MICRO / F.col("n_pairs")
    return (
        base.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("score_micronats", F.lit(0)).cast("long").alias(
                "score_micronats"
            ),
            F.when(F.col("n_pairs").isNotNull(), F.round(avg, 6)).alias(
                "avg_logprob"
            ),
            F.when(F.col("n_pairs").isNotNull(), F.round(F.exp(-avg), 4)).alias(
                "ppl"
            ),
        )
    )


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_score(requests_df(spark, sf_dir, "lm"))


def _sql_lm_ctes(vocab_size: int = VOCAB) -> str:
    """The scorer's CTE block (p/big/uni/lp/sc), shared by
    :func:`sql_lm_score` and :func:`sql_ppl_buckets`."""
    return f"""p AS (
  SELECT doc_id, unnest(tokens[1:len(tokens)-1]) AS a,
         unnest(tokens[2:len(tokens)]) AS b
  FROM req
),
big AS (SELECT a, b, count(*) AS c_ab FROM p GROUP BY 1, 2),
uni AS (
  SELECT a, count(*) AS c_a
  FROM (SELECT unnest(tokens) AS a FROM req) GROUP BY 1
),
lp AS (
  SELECT p.doc_id,
         CAST(floor(ln(CAST(coalesce(big.c_ab, 0) + 1 AS DOUBLE)
                       / CAST(coalesce(uni.c_a, 0) + {vocab_size} AS DOUBLE))
                    * {MICRO}) AS BIGINT) AS lp
  FROM p LEFT JOIN big USING (a, b) LEFT JOIN uni USING (a)
),
sc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(lp) AS BIGINT) AS score_micronats
  FROM lp GROUP BY doc_id
)"""


def sql_lm_score(vocab_size: int = VOCAB) -> str:
    """DuckDB twin over the shared ``req`` CTE."""
    return f"""WITH {sql_requests_cte()},
{_sql_lm_ctes(vocab_size)}
SELECT r.doc_id,
       coalesce(sc.n_pairs, 0) AS n_pairs,
       coalesce(sc.score_micronats, 0) AS score_micronats,
       round(CAST(sc.score_micronats AS DOUBLE) / {MICRO} / sc.n_pairs, 6)
         AS avg_logprob,
       round(exp(-(CAST(sc.score_micronats AS DOUBLE) / {MICRO} / sc.n_pairs)), 4)
         AS ppl
FROM req r LEFT JOIN sc ON sc.doc_id = r.doc_id"""


def ppl_buckets(
    req: DataFrame, by: str = "source", qs: tuple = (1 / 3, 2 / 3)
) -> DataFrame:
    """CCNet-style perplexity bucketing: per ``by`` stratum, split
    documents into head / middle / tail by the stratum's own exact
    type-1 ppl quantiles (``qs`` = the two cut fractions; head = lowest
    perplexity = most model-like).  Documents with no pairs carry a
    NULL bucket.

    Shape: lm_score's passes, then the length_quantiles trick applied
    to ppl — cumulative window over DISTINCT (stratum, ppl) counts, so
    the corpus is never sorted; the two thresholds ride a broadcast
    join back.  Output: (doc_id, stratum, ppl, bucket)."""
    lo, hi = sorted(float(q) for q in qs)
    if not (0.0 < lo < hi <= 1.0):
        raise ValueError(f"cut fractions must satisfy 0 < lo < hi <= 1, got {qs}")
    scored = lm_score(req).select("doc_id", "ppl")
    strat = req.select(
        F.col("doc_id").cast("string").alias("doc_id"), F.col(by).alias("stratum")
    )
    d = strat.join(scored, "doc_id")
    have = d.filter(F.col("ppl").isNotNull())
    counts = have.groupBy("stratum", "ppl").agg(F.count("*").alias("c"))
    w_cum = Window.partitionBy("stratum").orderBy("ppl")
    w_tot = Window.partitionBy("stratum")
    cum = counts.select(
        "stratum",
        "ppl",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_tot).alias("total"),
    )

    def thr(q: float, name: str):
        return (
            cum.filter(F.col("cum") >= F.ceil(F.lit(q) * F.col("total")).cast("long"))
            .groupBy("stratum")
            .agg(F.min("ppl").alias(name))
        )

    out = (
        d.join(F.broadcast(thr(lo, "__tlo")), "stratum", "left")
        .join(F.broadcast(thr(hi, "__thi")), "stratum", "left")
        .select(
            "doc_id",
            "stratum",
            "ppl",
            F.when(F.col("ppl").isNull(), F.lit(None).cast("string"))
            .when(F.col("ppl") <= F.col("__tlo"), "head")
            .when(F.col("ppl") <= F.col("__thi"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )
    return out


def sql_ppl_buckets(
    by: str = "source", qs: tuple = (1 / 3, 2 / 3), vocab_size: int = VOCAB
) -> str:
    lo, hi = sorted(float(q) for q in qs)
    return f"""WITH {sql_requests_cte()},
{_sql_lm_ctes(vocab_size)},
scored AS (
  SELECT r.doc_id, r.{by} AS stratum,
         round(exp(-(CAST(sc.score_micronats AS DOUBLE) / {MICRO} / sc.n_pairs)), 4)
           AS ppl
  FROM req r LEFT JOIN sc ON sc.doc_id = r.doc_id
),
cnt AS (
  SELECT stratum, ppl, count(*) AS c FROM scored
  WHERE ppl IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT stratum, ppl,
         sum(c) OVER (PARTITION BY stratum ORDER BY ppl) AS cum,
         sum(c) OVER (PARTITION BY stratum) AS total
  FROM cnt
),
tlo AS (
  SELECT stratum, min(ppl) AS t FROM cum
  WHERE cum >= CAST(ceil({lo!r} * total) AS BIGINT) GROUP BY stratum
),
thi AS (
  SELECT stratum, min(ppl) AS t FROM cum
  WHERE cum >= CAST(ceil({hi!r} * total) AS BIGINT) GROUP BY stratum
)
SELECT s.doc_id, s.stratum, s.ppl,
       CASE WHEN s.ppl IS NULL THEN NULL
            WHEN s.ppl <= tlo.t THEN 'head'
            WHEN s.ppl <= thi.t THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored s
LEFT JOIN tlo USING (stratum)
LEFT JOIN thi USING (stratum)"""
