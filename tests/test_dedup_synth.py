"""Row-identity of the fused synthesis+hash dedup paths (round-8
optimization) vs the unfused Arrow kernels they replace: the request
token arrays are derived data, so q_simhash / the LSH signature table now
synthesize them in numpy inside the hashing Arrow pass instead of
materializing them through interpreted HOF expressions and shipping them
across the exchange.  Identical integer math; oracles unchanged."""

import pyspark.sql.functions as F
import pytest

from tokforge.pipeline.dedup import (
    FEATURE_SPACE,
    SHINGLE_K,
    _materialized_requests,
    _synth_request_ids,
    q_simhash,
    signatures_arrow,
    signatures_synth,
    simhash_arrow,
)
from tokforge.sources.requests import requests_df

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.mark.parametrize("sf", [SF_SMALL, SF_MED])
def test_fused_simhash_matches_unfused(spark, sf):
    fused = sorted(map(tuple, q_simhash(spark, sf).collect()))
    unfused = sorted(
        map(tuple, simhash_arrow(requests_df(spark, sf, "simhash")).collect())
    )
    assert fused == unfused


@pytest.mark.parametrize("feature_space", [FEATURE_SPACE, None])
@pytest.mark.parametrize("replicas", [1, 3])
def test_fused_signatures_match_unfused(spark, feature_space, replicas):
    fused = sorted(
        (r["doc_id"], tuple(r["sig"]))
        for r in signatures_synth(
            _synth_request_ids(spark, SF_SMALL, replicas), feature_space
        ).collect()
    )
    req = _materialized_requests(spark, SF_SMALL, "minhash", replicas).filter(
        F.col("n_tok") >= SHINGLE_K
    )
    unfused = sorted(
        (r["doc_id"], tuple(r["sig"]))
        for r in signatures_arrow(req, feature_space).collect()
    )
    assert fused == unfused
