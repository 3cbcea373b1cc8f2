"""Corpus statistics (tokforge/pipeline/stats.py) vs DuckDB mirrors on
the requests fixture: global token frequencies, top-V vocabulary with
coverage mass, per-doc OOV rate, and exact per-source length quantiles
(plus a hand-computed quantile grid).
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL
from tokforge.pipeline.stats import (
    length_quantiles,
    oov_stats,
    token_frequencies,
    vocab_top,
)
from tokforge.sources.requests import requests_df, sql_requests_cte

V = 64  # top-V vocabulary size under test


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'"
    )
    return con


_RANKED_CTE = f"""WITH {sql_requests_cte()},
freq AS (
  SELECT t AS token, count(*) AS cnt
  FROM (SELECT unnest(tokens) AS t FROM req)
  GROUP BY 1
),
ranked AS (
  SELECT token, cnt,
         row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank,
         sum(cnt) OVER (ORDER BY cnt DESC, token ASC ROWS UNBOUNDED PRECEDING) AS cumc,
         sum(cnt) OVER () AS tot
  FROM freq
)"""


def test_token_frequencies_matches_duckdb(spark):
    req = requests_df(spark, SF_SMALL, "stats")
    got = sorted((r["token"], r["cnt"]) for r in token_frequencies(req).collect())
    want = sorted(
        (int(t), int(c))
        for t, c in _con()
        .execute(
            f"""WITH {sql_requests_cte()}
SELECT t AS token, count(*) AS cnt
FROM (SELECT unnest(tokens) AS t FROM req) GROUP BY 1"""
        )
        .fetchall()
    )
    assert got == want


def test_vocab_top_matches_duckdb(spark):
    req = requests_df(spark, SF_SMALL, "stats")
    got = sorted(
        (r["token"], r["cnt"], r["rank"], r["mass"])
        for r in vocab_top(req, V).collect()
    )
    want = sorted(
        (int(t), int(c), int(rk), float(m))
        for t, c, rk, m in _con()
        .execute(
            f"""{_RANKED_CTE}
SELECT token, cnt, rank, round(CAST(cumc AS DOUBLE) / tot, 6) AS mass
FROM ranked WHERE rank <= {V}"""
        )
        .fetchall()
    )
    assert got == want
    assert len(got) == V


def test_oov_stats_matches_duckdb(spark):
    req = requests_df(spark, SF_SMALL, "stats")
    got = sorted(
        (r["doc_id"], r["n_tok"], r["oov_cnt"], r["oov_rate"])
        for r in oov_stats(req, V).collect()
    )
    want = sorted(
        (str(d), int(n), int(o), float(rt))
        for d, n, o, rt in _con()
        .execute(
            f"""{_RANKED_CTE},
vocab AS (SELECT token FROM ranked WHERE rank <= {V}),
tok AS (SELECT doc_id, unnest(tokens) AS t FROM req),
oov AS (
  SELECT doc_id,
         count(*) AS n_tok,
         count(*) FILTER (WHERE t NOT IN (SELECT token FROM vocab)) AS oov_cnt
  FROM tok GROUP BY doc_id
)
SELECT doc_id, n_tok, oov_cnt,
       round(CAST(oov_cnt AS DOUBLE) / greatest(n_tok, 1), 6) AS oov_rate
FROM oov"""
        )
        .fetchall()
    )
    assert got == want
    # every doc is present and rates are sane
    assert len(got) == req.count()
    assert all(0.0 <= rt <= 1.0 for _, _, _, rt in got)


def test_oov_stats_explicit_vocab(spark):
    # passing a precomputed vocab DataFrame gives the same result as the
    # internal build (and allows scoring against a foreign vocabulary)
    req = requests_df(spark, SF_SMALL, "stats")
    vocab = vocab_top(req, V)
    got = sorted(map(tuple, oov_stats(req, V, vocab=vocab).collect()))
    want = sorted(map(tuple, oov_stats(req, V).collect()))
    assert got == want


def test_length_quantiles_matches_duckdb(spark):
    req = requests_df(spark, SF_SMALL, "stats")
    qs = (0.5, 0.9, 0.99, 1.0)
    got = sorted(
        (r["source"], r["q"], r["value"])
        for r in length_quantiles(req, qs).collect()
    )
    want = sorted(
        (s, float(q), int(v))
        for s, q, v in _con()
        .execute(
            f"""WITH {sql_requests_cte()},
c AS (SELECT source, n_tok, count(*) AS c FROM req GROUP BY 1, 2),
cum AS (
  SELECT source, n_tok,
         sum(c) OVER (PARTITION BY source ORDER BY n_tok) AS cum,
         sum(c) OVER (PARTITION BY source) AS total
  FROM c
),
qs AS (SELECT CAST(unnest([0.5, 0.9, 0.99, 1.0]) AS DOUBLE) AS q)
SELECT source, q, CAST(min(n_tok) AS BIGINT) AS value
FROM cum, qs
WHERE cum >= CAST(ceil(q * total) AS BIGINT)
GROUP BY source, q"""
        )
        .fetchall()
    )
    assert got == want


def test_length_quantiles_hand_case(spark):
    # 10 rows of known lengths: type-1 quantile = min value with
    # cum >= ceil(q * 10)
    rows = [("s", n) for n in [1, 1, 2, 2, 3, 3, 3, 8, 9, 100]]
    df = spark.createDataFrame(rows, "source string, n_tok int")
    got = {
        (r["q"]): r["value"]
        for r in length_quantiles(df, (0.1, 0.5, 0.75, 0.9, 1.0)).collect()
    }
    assert got == {0.1: 1, 0.5: 3, 0.75: 8, 0.9: 9, 1.0: 100}


def test_length_quantiles_rejects_bad_q(spark):
    df = spark.createDataFrame([("s", 1)], "source string, n_tok int")
    with pytest.raises(ValueError):
        length_quantiles(df, (0.0, 0.5))
    with pytest.raises(ValueError):
        length_quantiles(df, ())
