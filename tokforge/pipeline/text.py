"""Text-analysis operators for a large-scale training-data pipeline:
language-ID (marker-word heuristic), quality scoring, token counting, and
document fingerprinting — all pure built-in column algebra (JVM-side,
whole-stage codegen; zero Python in the hot path), each with an exact
DuckDB SQL mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tokforge.sources.requests import load_documents, sql_requests_cte

# marker-word counts drive the language heuristic; counts are computed with
# the replace-length trick so Spark and SQL share exact semantics.
_MARKERS = {"en": " the ", "fr": " le ", "de": " der ", "es": " el ", "zh": " de "}

_STOPWORDS = (" the ", " a ", " of ", " to ", " and ", " in ")
_PUNCT = (".", ",", "!", "?")


def _count_occurrences_spark(padded, needle: str):
    return (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit("")))) / len(
        needle
    )


def _count_occurrences_sql(padded: str, needle: str) -> str:
    return f"(length({padded}) - length(replace({padded}, '{needle}', ''))) / {len(needle)}"


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + char stats (BPE-precursor accounting)."""
    docs = load_documents(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct_words"),
        F.round(
            F.aggregate(
                F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, b: a + b
            ).cast("double")
            / F.size(words),
            4,
        ).alias("avg_word_len"),
    )


SQL_TOKEN_COUNT = """SELECT doc_id,
       length(text) AS n_chars_actual,
       len(string_split(text, ' ')) AS n_words,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
       round(CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w)))
                  AS DOUBLE) / len(string_split(text, ' ')), 4) AS avg_word_len
FROM documents"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language heuristic (n-gram language-ID analog).
    Deterministic tie-break order: zh > en > fr > de > es."""
    docs = load_documents(spark, sf_dir)
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    counts = {k: _count_occurrences_spark(padded, v) for k, v in _MARKERS.items()}
    predicted = (
        F.when(counts["zh"] > counts["en"], "zh")
        .when(
            (counts["en"] >= counts["fr"])
            & (counts["en"] >= counts["de"])
            & (counts["en"] >= counts["es"]),
            "en",
        )
        .when((counts["fr"] >= counts["de"]) & (counts["fr"] >= counts["es"]), "fr")
        .when(counts["de"] >= counts["es"], "de")
        .otherwise("es")
    )
    return docs.select(
        "doc_id",
        "lang",
        predicted.alias("predicted_lang"),
        counts["en"].cast("int").alias("marker_hits"),
    )


def _sql_lang_id() -> str:
    padded = "(' ' || lower(text) || ' ')"
    c = {k: _count_occurrences_sql(padded, v) for k, v in _MARKERS.items()}
    return f"""SELECT doc_id, lang,
       CASE WHEN {c['zh']} > {c['en']} THEN 'zh'
            WHEN {c['en']} >= {c['fr']} AND {c['en']} >= {c['de']} AND {c['en']} >= {c['es']} THEN 'en'
            WHEN {c['fr']} >= {c['de']} AND {c['fr']} >= {c['es']} THEN 'fr'
            WHEN {c['de']} >= {c['es']} THEN 'de'
            ELSE 'es' END AS predicted_lang,
       CAST({c['en']} AS INTEGER) AS marker_hits
FROM documents"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length, punctuation-density, and stopword
    ratio blended into one score (the C4/Gopher-style filter analog)."""
    docs = load_documents(spark, sf_dir)
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    n_words = F.size(F.split("text", " ")).cast("double")
    stop_hits = None
    for s in _STOPWORDS:
        c = _count_occurrences_spark(padded, s)
        stop_hits = c if stop_hits is None else stop_hits + c
    punct_hits = None
    for p in _PUNCT:
        c = F.length("text") - F.length(F.replace(F.col("text"), F.lit(p), F.lit("")))
        punct_hits = c if punct_hits is None else punct_hits + c
    length_score = F.least(F.lit(1.0), n_words / 100.0)
    punct_ratio = punct_hits.cast("double") / F.greatest(F.length("text"), F.lit(1))
    stop_ratio = stop_hits.cast("double") / F.greatest(n_words, F.lit(1.0))
    score = F.round(
        0.4 * length_score + 0.3 * (1.0 - punct_ratio) + 0.3 * stop_ratio, 4
    )
    return docs.select(
        "doc_id",
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        score.alias("quality_score"),
    )


def _sql_quality_score() -> str:
    padded = "(' ' || lower(text) || ' ')"
    stop = " + ".join(_count_occurrences_sql(padded, s) for s in _STOPWORDS)
    punct = " + ".join(
        f"(length(text) - length(replace(text, '{p}', '')))" for p in _PUNCT
    )
    return f"""SELECT doc_id,
       round(CAST({stop} AS DOUBLE) / greatest(len(string_split(text, ' ')), 1.0), 4) AS stopword_ratio,
       round(CAST({punct} AS DOUBLE) / greatest(length(text), 1), 6) AS punct_ratio,
       round(0.4 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0)
           + 0.3 * (1.0 - CAST({punct} AS DOUBLE) / greatest(length(text), 1))
           + 0.3 * (CAST({stop} AS DOUBLE) / greatest(len(string_split(text, ' ')), 1.0)), 4) AS quality_score
FROM documents"""


# Polynomial rolling hash (Rabin-Karp): h = fold(tokens, 0, acc*B + t mod M)
_RH_B = 1000003
_RH_M = 2147483647


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two content fingerprints per document: the normalized md5 (64-bit
    content identity) and a true POLYNOMIAL ROLLING HASH over the token
    stream — `h = fold(tokens, 0, (acc*B + t) mod M)` — sequential fold
    entirely JVM-side via `aggregate` (at scale: one narrow pass, order-
    sensitive so near-identical token streams with swaps hash apart)."""
    from tokforge.sources.requests import requests_df

    docs = load_documents(spark, sf_dir)
    normalized = F.replace(F.lower("text"), F.lit(" "), F.lit(""))
    md5_fp = docs.select(
        "doc_id",
        F.substring(F.md5(normalized), 1, 16).alias("fingerprint"),
        F.length(normalized).cast("long").alias("normalized_len"),
    )
    req = requests_df(spark, sf_dir, "fingerprint").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.aggregate(
            "tokens",
            F.lit(0).cast("long"),
            lambda acc, t: (acc * _RH_B + t.cast("long")) % _RH_M,
        ).alias("rolling_hash"),
    )
    return md5_fp.join(req, "doc_id")


SQL_FINGERPRINT = f"""WITH {sql_requests_cte()}
SELECT d.doc_id,
       substr(md5(replace(lower(d.text), ' ', '')), 1, 16) AS fingerprint,
       length(replace(lower(d.text), ' ', '')) AS normalized_len,
       list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(r.tokens, x -> CAST(x AS BIGINT))),
                   (acc, t) -> (acc * {_RH_B} + t) % {_RH_M}) AS rolling_hash
FROM documents d JOIN req r ON r.doc_num = d.doc_id"""


TEXT_QUERIES = {
    "text_token_count": (q_token_count, SQL_TOKEN_COUNT),
    "text_lang_id": (q_lang_id, _sql_lang_id()),
    "text_quality_score": (q_quality_score, _sql_quality_score()),
    "text_fingerprint": (q_fingerprint, SQL_FINGERPRINT),
}
