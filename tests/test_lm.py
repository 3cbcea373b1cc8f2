"""Bigram-LM perplexity scoring (tokforge/pipeline/lm.py): DuckDB mirror
equality on the real corpus, a pure-python add-1 bigram reference on a
hand corpus, the integer-micronat order-independence property, and the
quality-signal sanity (repetitive text scores lower perplexity than
novel text under the corpus's own model).
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from tests.conftest import SF_SMALL
from tokforge.pipeline.lm import MICRO, lm_score, q_lm_score, sql_lm_score
from tokforge.sources.requests import requests_df

V = 1000  # small vocab constant for the hand corpus


def _py_lm(corpus: dict, vocab_size: int) -> dict:
    big = Counter()
    # NB uni must count ALL tokens (the history count c_a is the
    # unigram frequency of a anywhere, matching token_frequencies)
    uni = Counter()
    for t in corpus.values():
        big.update(zip(t, t[1:]))
        uni.update(t)
    out = {}
    for d, t in corpus.items():
        lps = [
            math.floor(
                math.log((big[(a, b)] + 1) / (uni[a] + vocab_size)) * MICRO
            )
            for a, b in zip(t, t[1:])
        ]
        n = len(lps)
        if n == 0:
            out[d] = (0, 0, None, None)
        else:
            s = sum(lps)
            avg = s / MICRO / n
            out[d] = (n, s, round(avg, 6), round(math.exp(-avg), 4))
    return out


def test_matches_python_reference(spark):
    corpus = {
        "a": [1, 2, 3, 1, 2, 3, 1, 2],
        "b": [4, 5, 6, 7, 8, 9],
        "c": [1, 2],
        "d": [7],          # no pairs
        "e": [],           # empty
    }
    df = spark.createDataFrame(
        sorted(corpus.items()), "doc_id string, tokens array<int>"
    )
    got = {
        r["doc_id"]: (r["n_pairs"], r["score_micronats"], r["avg_logprob"], r["ppl"])
        for r in lm_score(df, vocab_size=V).collect()
    }
    assert got == _py_lm(corpus, V)
    # the repetitive doc is MORE probable under the corpus model
    assert got["a"][3] < got["b"][3]


def test_matches_duckdb_mirror(spark):
    req = requests_df(spark, SF_SMALL, "lm")
    got = sorted(map(tuple, q_lm_score(spark, SF_SMALL).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(sql_lm_score()).fetchall()))
    assert len(got) == len(want) == 500
    assert got == want


def test_partition_independent_integer_score(spark):
    """The micronat quantization is the point: integer sums commute, so
    the score is a pure function of the corpus regardless of layout."""
    req = requests_df(spark, SF_SMALL, "lm")
    a = {r["doc_id"]: r["score_micronats"] for r in lm_score(req).collect()}
    b = {
        r["doc_id"]: r["score_micronats"]
        for r in lm_score(req.repartition(13)).collect()
    }
    assert a == b
    assert all(isinstance(v, int) for v in a.values())


def test_ppl_buckets_mirror_and_semantics(spark):
    """CCNet head/middle/tail: per-source exact tertiles, DuckDB mirror
    equality, and the bucket semantics (head = lowest perplexity; every
    scored doc lands in exactly one bucket; per-stratum shares ~1/3)."""
    from collections import Counter

    from tokforge.pipeline.lm import ppl_buckets, sql_ppl_buckets

    got_rows = ppl_buckets(requests_df(spark, SF_SMALL, "lm")).collect()
    got = sorted(map(tuple, got_rows))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(sql_ppl_buckets()).fetchall()))
    assert got == want and len(got) == 500

    by_strat = {}
    for r in got_rows:
        assert r["bucket"] in ("head", "middle", "tail")
        by_strat.setdefault(r["stratum"], []).append(r)
    for s, rs in by_strat.items():
        c = Counter(r["bucket"] for r in rs)
        n = len(rs)
        # type-1 tertiles: each bucket holds a positive share, and the
        # head cut is at >= 1/3 of the stratum
        assert c["head"] >= -(-n // 3), (s, c)
        heads = [r["ppl"] for r in rs if r["bucket"] == "head"]
        tails = [r["ppl"] for r in rs if r["bucket"] == "tail"]
        if heads and tails:
            assert max(heads) < min(tails), s

    import pytest

    with pytest.raises(ValueError):
        ppl_buckets(requests_df(spark, SF_SMALL, "lm"), qs=(0.5, 0.2, 0.9))
