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
    sql_quality_gate,
)

# thresholds chosen so the fixture exercises several bits at once
PARAMS = dict(
    min_tok=8, max_tok=200, min_quality=0.5, max_rep=0.2, max_oov=0.98,
    rep_k=3, vocab_v=1024,
)


def _mirror_sql() -> str:
    return sql_quality_gate(**PARAMS)


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