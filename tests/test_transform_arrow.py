"""Arrow-native transform path == pandas path, bit for bit, including
signature verification, error channels, and empty/edge buckets."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from tokforge.engine.config import EngineConfig
from tokforge.engine.transform import make_sign_udf, transform_requests
from tokforge.engine.transform_arrow import transform_requests_arrow
from tokforge.sources.requests import requests_df

CFG = EngineConfig()

CHAINS = [
    "resize:fill:128:0:1:1/gravity:ce/padding:4/rotate:90/brightness:25/"
    "contrast:1.2/saturation:0.8/blur:1.5/sharpen:0.8/pixelate:4/"
    "watermark:0.6:soea/background:336699/quality:80/format:jpeg",
    "crop:50:0:ce",  # default-format fallback per src_dtype
    "raw",
    "rotate:45/format:png",  # parse error channel
    "expires:1704070800/format:png",  # expiry channel
    "max_bytes:40/format:jpeg/quality:95",
]


def _rows(df):
    return {
        r["doc_id"]: (
            r["sig_valid"],
            list(r["tokens_out"]) if r["tokens_out"] is not None else None,
            r["n_out"],
            r["dtype"],
            r["size_bytes"],
            r["quality"],
            r["fmt"],
            r["error"],
        )
        for r in df.collect()
    }


def test_arrow_equals_pandas_across_chains(spark):
    for chain in CHAINS:
        req = requests_df(spark, SF_SMALL, chain).limit(60)
        a = _rows(transform_requests(req, CFG, verify=False))
        b = _rows(transform_requests_arrow(req, CFG, verify=False))
        assert a == b, chain


def test_bearer_gate_parity(spark):
    """The bearer-secret admission filter must act identically on BOTH
    paths (round-1 advice: it was Arrow-only, silently processing
    unauthorized rows through the pandas path)."""
    cfg = EngineConfig(bearer_token="s3cret")
    chain = "crop:8:0/format:png"
    req = requests_df(spark, SF_SMALL, chain).limit(30)
    req = req.withColumn(
        "bearer",
        F.when(F.col("doc_id").cast("long") % 2 == 0, F.lit("s3cret")).otherwise(
            F.lit("wrong")
        ),
    )
    a = _rows(transform_requests(req, cfg, verify=False))
    b = _rows(transform_requests_arrow(req, cfg, verify=False))
    assert a == b
    assert a, "bearer filter must admit the matching half"
    assert all(int(d) % 2 == 0 for d in a), "only bearer-matching rows admitted"


def test_arrow_verify_in_pass(spark):
    chain = "crop:8:0/format:png"
    req = requests_df(spark, SF_SMALL, chain).limit(20)
    sign = make_sign_udf(CFG)
    req = req.withColumn("sig", sign(F.col("ops"), F.col("doc_id")))
    req = req.withColumn(
        "sig",
        F.when(F.col("doc_id").cast("long") % 3 == 0, F.lit("unsafe")).otherwise(
            F.col("sig")
        ),
    )
    out = transform_requests_arrow(req, CFG, verify=True)
    for r in out.select("doc_id", "sig_valid").collect():
        assert r["sig_valid"] == (int(r["doc_id"]) % 3 != 0)


def test_output_shaping_columns_both_paths(spark):
    """content_disposition + meta_orientation (round-4 real effects) agree
    between the pandas and Arrow paths and follow the reference rules:
    filename -> header (sanitized), strip -> NULL metadata, auto_rotate
    consumes the EXIF tag (1), auto_rotate:false / raw keep the original."""
    from tokforge.engine.config import EngineConfig
    from tokforge.engine.transform import transform_requests
    from tokforge.engine.transform_arrow import transform_requests_arrow
    from tokforge.sources.requests import requests_df

    cases = {
        'filename:a"b/return_attachment:1/strip_metadata:true/format:jpeg': (
            'attachment; filename="a_b"',
            None,
        ),
        "filename:x.png/auto_rotate:false/format:png": (
            'inline; filename="x.png"',
            "orig",
        ),
        "crop:10:0/format:png": (None, 1),
        "raw": (None, "orig"),
    }
    cfg = EngineConfig()
    for chain, (cd, meta) in cases.items():
        req = requests_df(spark, "/root/testdata/sf0.001", chain).limit(24)
        for path_fn in (transform_requests, transform_requests_arrow):
            rows = path_fn(req, cfg, verify=False).collect()
            assert rows, chain
            for r in rows:
                assert r["content_disposition"] == cd, (chain, path_fn)
                expect = 1 + int(r["doc_id"]) % 8 if meta == "orig" else meta
                assert r["meta_orientation"] == expect, (chain, path_fn, r)


def test_status_taxonomy_both_paths(spark):
    """The status column mirrors the reference's error classes
    (service.rs:676-800): 403 bad signature, 404 expired, 400 other
    errors, 200 OK — identical in both execution paths and equal to the
    scalar mapping."""
    from tokforge.engine.config import EngineConfig
    from tokforge.engine.transform import (
        make_sign_udf,
        status_for_error,
        transform_requests,
    )
    from tokforge.engine.transform_arrow import transform_requests_arrow
    from tokforge.sources.requests import requests_df

    cfg = EngineConfig()
    # expires = EPOCH+10s: docs with doc_id%7200 > 10 expire (most of 30)
    chain = "expires:1704067210/crop:10:0/format:int32"
    req = requests_df(spark, "/root/testdata/sf0.001", chain).limit(30)
    sign = make_sign_udf(cfg)
    d = F.col("doc_id").cast("long")
    req = req.withColumn(
        "sig",
        F.when(d % 5 == 0, F.lit("bad-signature")).otherwise(
            sign(F.col("ops"), F.col("doc_id"))
        ),
    )
    for path_fn in (transform_requests, transform_requests_arrow):
        rows = path_fn(req, cfg, verify=True).collect()
        seen = set()
        for r in rows:
            expect = status_for_error(r["error"], r["sig_valid"])
            assert r["status"] == expect, (path_fn, r)
            seen.add(r["status"])
        assert {200, 403, 404} <= seen
