"""Quality gate (tokforge/pipeline/gate.py): the composed keep/drop
decision matches a DuckDB mirror built from the SAME component mirrors
(quality score, k-gram repetition, top-V OOV), and the reason bitmask
decomposes correctly.
"""

from __future__ import annotations

import duckdb

from tests.conftest import SF_SMALL
from tokforge.pipeline.gate import (
    R_HIGH_OOV,
    R_LOW_QUALITY,
    R_TOO_LONG,
    R_TOO_SHORT,
    quality_gate,
)
from tokforge.pipeline.substr import sql_kgram_fold
from tokforge.pipeline.text import _sql_quality_score
from tokforge.sources.requests import sql_requests_cte

# thresholds chosen so the fixture exercises several bits at once
PARAMS = dict(
    min_tok=8, max_tok=200, min_quality=0.5, max_rep=0.2, max_oov=0.98,
    rep_k=3, vocab_v=1024,
)


def _mirror_sql() -> str:
    fold = sql_kgram_fold(PARAMS["rep_k"])
    k = PARAMS["rep_k"]
    v = PARAMS["vocab_v"]
    return f"""WITH {sql_requests_cte()},
q AS ({_sql_quality_score()}),
rep AS (
  SELECT doc_id,
         round(CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE)
               / greatest(len(gs), 1), 6) AS rep_ratio
  FROM (SELECT doc_id,
               list_transform(range(0, n_tok - {k} + 1), s -> {fold}) AS gs
        FROM req)
),
freq AS (
  SELECT t AS token, count(*) AS cnt
  FROM (SELECT unnest(tokens) AS t FROM req) GROUP BY 1
),
ranked AS (
  SELECT token, row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank
  FROM freq
),
vocab AS (SELECT token FROM ranked WHERE rank <= {v}),
tok AS (SELECT doc_id, unnest(tokens) AS t FROM req),
oov AS (
  SELECT doc_id,
         round(CAST(count(*) FILTER (WHERE t NOT IN (SELECT token FROM vocab))
                    AS DOUBLE) / greatest(count(*), 1), 6) AS oov_rate
  FROM tok GROUP BY doc_id
),
gate AS (
  SELECT r.doc_id, CAST(r.n_tok AS BIGINT) AS n_tok,
         q.quality_score, rep.rep_ratio, oov.oov_rate,
         CAST(CASE WHEN r.n_tok < {PARAMS['min_tok']} THEN 1 ELSE 0 END
            + CASE WHEN r.n_tok > {PARAMS['max_tok']} THEN 2 ELSE 0 END
            + CASE WHEN q.quality_score < {PARAMS['min_quality']} THEN 4 ELSE 0 END
            + CASE WHEN rep.rep_ratio > {PARAMS['max_rep']} THEN 8 ELSE 0 END
            + CASE WHEN oov.oov_rate > {PARAMS['max_oov']} THEN 16 ELSE 0 END
            AS BIGINT) AS reasons
  FROM req r
  JOIN q ON q.doc_id = r.doc_num
  JOIN rep ON rep.doc_id = r.doc_id
  JOIN oov ON oov.doc_id = r.doc_id
)
SELECT doc_id, n_tok, quality_score, rep_ratio, oov_rate, reasons,
       reasons = 0 AS keep
FROM gate"""


def test_gate_matches_composed_mirror(spark):
    got = sorted(map(tuple, quality_gate(spark, SF_SMALL, **PARAMS).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'"
    )
    want = sorted(
        (str(d), int(n), float(q), float(rr), float(ov), int(rs), bool(kp))
        for d, n, q, rr, ov, rs, kp in con.execute(_mirror_sql()).fetchall()
    )
    assert got == want
    assert len(got) == 500


def test_gate_reasons_decompose(spark):
    rows = quality_gate(spark, SF_SMALL, **PARAMS).collect()
    kept = [r for r in rows if r["keep"]]
    dropped = [r for r in rows if not r["keep"]]
    assert kept and dropped, "thresholds split the fixture both ways"
    seen_bits = set()
    for r in rows:
        reasons = r["reasons"]
        assert (reasons == 0) == r["keep"]
        assert bool(reasons & R_TOO_SHORT) == (r["n_tok"] < PARAMS["min_tok"])
        assert bool(reasons & R_TOO_LONG) == (r["n_tok"] > PARAMS["max_tok"])
        assert bool(reasons & R_LOW_QUALITY) == (
            r["quality_score"] < PARAMS["min_quality"]
        )
        assert bool(reasons & R_HIGH_OOV) == (r["oov_rate"] > PARAMS["max_oov"])
        for bit in (1, 2, 4, 8, 16):
            if reasons & bit:
                seen_bits.add(bit)
    assert len(seen_bits) >= 2, f"fixture exercises several causes, saw {seen_bits}"