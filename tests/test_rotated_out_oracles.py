"""Queries rotated OUT of the driver's 50-slot window keep their full
(Spark query ↔ DuckDB oracle) equality here, so the three-way invariant
survives registry churn.  Round-6 rotations: dedup_minhash_signatures and
ann_ivf_assign gave their slots to corpus-assembly ops (their lineage is
still driver-hash-checked inside dedup_lsh_pairs / ann_ivf_search);
stream_window_tumbling gave its slot to stream_lsh_dedup (its semantics —
watermark-finalized tumbling counts == the batch GROUP BY — stay gated
through window_tumbling_sliding); metrics_by_source gave its slot to
cep_pattern (a plain per-source GROUP BY is a strict subset of the gated
window_tumbling_sliding surface).
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL
from tokforge.engine.queries import ENGINE_QUERIES_EXTRA
from tokforge.pipeline.dedup import DEDUP_QUERIES_EXTRA
from tokforge.pipeline.multimodal import MULTIMODAL_QUERIES_EXTRA
from tokforge.pipeline.similarity import SIMILARITY_QUERIES_EXTRA
from tokforge.streaming.queries import STREAMING_QUERIES_EXTRA

_ROTATED = {
    **ENGINE_QUERIES_EXTRA,
    **DEDUP_QUERIES_EXTRA,
    **MULTIMODAL_QUERIES_EXTRA,
    **SIMILARITY_QUERIES_EXTRA,
    **STREAMING_QUERIES_EXTRA,
}

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.mark.parametrize("name", sorted(_ROTATED))
def test_rotated_out_query_matches_oracle(spark, name):
    fn, sql = _ROTATED[name]
    got = sorted(tuple(r) for r in fn(spark, SF_SMALL).collect())
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert len(got) == len(want) and got, name
    assert got == want, name
