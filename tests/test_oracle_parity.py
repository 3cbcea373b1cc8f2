"""Kernel-vs-SQL-oracle parity: for a corpus of chains covering every
operator, the DuckDB SQL emitted by tokforge.engine.oracle must reproduce
the numpy kernel exactly on the sf0.001 derived request rows.  This pins
the one drift surface between the Spark engine and the driver's oracle."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from tests.conftest import SF_SMALL
from tokforge.engine.oracle import oracle_transform_sql
from tokforge.operators.kernel import apply_plan
from tokforge.plans.options import parse_chain
from tokforge.sources.requests import sql_requests_cte

_BASE_CHAINS = [
    "resize:fit:64/format:int16",
    "resize:fill:50:0:0:0/gravity:soea/format:png",
    "resize:fill:50/gravity:nowe/format:png",
    "resize:force:80:0:1/format:jpeg/quality:70",
    "resize:auto:90/format:tiff",
    "resize:fit:0:48/format:png",
    "size:77/format:webp",
    "crop:40:0:ce/format:int32",
    "crop:40:0:ea/rotate:90/format:gif",
    "crop:0:0/format:png",
    "padding:5:7/background:ff0000/format:png",
    "padding:1:2:3:4/format:png",
    "resize:fit:300:0:1:1/extend:1:nowe/background:10:20:30/format:png",
    "resize:fill:500:0:0:1/extend:1/format:png",
    "zoom:1.5/format:int64",
    "zoom:0.25/format:png",
    "min-width:120/format:int32",
    "min-width:50/min-height:90/format:png",
    "flip:1:0/format:png",
    "flip:0:1/format:png",
    "rotate:180/format:png",
    "auto_rotate:false/rotate:270/format:png",
    "blur:2/format:png",
    "blur:0.5/format:png",
    "sharpen:0.5/format:png",
    "sharpen:12/format:png",  # clamps to 10
    "pixelate:7/format:png",
    "brightness:100/contrast:1.4/saturation:0.6/format:png",
    "brightness:-200/format:png",
    "saturation:2.5/format:png",
    "watermark:0.7:soea/format:png",
    "watermark:1:nowe/background:0:0:255/format:jpeg/quality:90",
    "watermark:0.3:ce/format:png",
    "dpr:2.5/resize:fit:40/padding:3/format:png",
    "quality:30/format:avif",
    "quality:100/format:jpeg",
    "format:uint8",
    "format:gif",
    "raw",
    "crop:50:0:ce",  # default-format fallback to src dtype
    "expires:1704070800/crop:10:0/format:int32",
    "format_quality:int16:40:uint8:90",  # __src__ per-row format_quality
    # resizing algorithms (reference doc/5.1): linear/cubic interpolated
    # resamples, true windowed-sinc lanczos, up- and down-scale paths
    "resize:fit:200:0:1/resizing_algorithm:linear/format:png",
    "resize:fill:0:60:1/ra:linear/format:png",
    "resize:fit:200:0:1/ra:cubic/format:png",
    "zoom:1.7/ra:cubic/format:int32",
    "zoom:0.4/ra:linear/format:png",
    "min-width:150/ra:lanczos3/format:int32",
    "resize:fit:90:0:1/ra:lanczos2/quality:60/format:jpeg",
    "zoom:2.3/ra:lanczos3/format:png",  # pure-lanczos upsample
    "zoom:0.37/ra:lanczos2/format:int32",  # lanczos downsample
    "resize:force:73:0:1/ra:lanczos3/min-width:110/format:png",  # two lanczos sites
    "resize:fit:100:0:1/format:png",  # DEFAULT ra = lanczos3 (no alias)
    # hypothesis-found regressions
    "quality:1/format:jpeg/max_bytes:8",  # single-candidate walk-down
    "quality:13/format:gif/max_bytes:40",  # lossless walk-down w/ dtype rule
]

# every driver-gated chain, every r7-rotated-out chain, and every
# pytest-only extra chain is parity checked too (incl. max_bytes
# walk-down and the watermark_url payload)
from tokforge.engine.queries import (  # noqa: E402
    OP_CHAINS,
    OP_CHAINS_EXTRA,
    OP_CHAINS_ROTATED,
)

CHAINS = list(
    dict.fromkeys(
        _BASE_CHAINS
        + list(OP_CHAINS.values())
        + list(OP_CHAINS_ROTATED.values())
        + list(OP_CHAINS_EXTRA.values())
    )
)


@pytest.fixture(scope="module")
def req_rows():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'"
    )
    df = con.execute(
        f"WITH {sql_requests_cte()} "
        "SELECT doc_id, orientation, src_dtype, tokens FROM req ORDER BY doc_num"
    ).df()
    return con, df


def test_oracle_rejects_unsupported_chains():
    """Unsupported plans must fail at registration, never emit wrong SQL
    (round-1 advice: skip_processing / __src__ max_bytes silently drifted)."""
    with pytest.raises(ValueError):
        oracle_transform_sql("skip_processing:int16/format:int16")
    with pytest.raises(ValueError):
        oracle_transform_sql("max_bytes:100/crop:10:0")  # src-fallback format


def test_watermark_payload_tokens():
    from tokforge.constants import SENTINEL_BASE
    from tokforge.operators.kernel import watermark_payload_tokens

    toks = watermark_payload_tokens("AB")
    assert list(toks) == [SENTINEL_BASE + (65 % 100), SENTINEL_BASE + (66 % 100)]
    # empty payload falls back to the default cycling pattern
    fallback = watermark_payload_tokens("")
    assert len(fallback) == 100 and fallback[0] == SENTINEL_BASE


@pytest.mark.parametrize("chain", CHAINS)
def test_oracle_matches_kernel(req_rows, chain):
    con, df = req_rows
    sql = oracle_transform_sql(chain)
    odf = con.execute(sql).df().set_index("doc_id")
    plan = parse_chain(chain)
    # sample every 7th row for speed; full sweep runs in tools/check_correctness
    for _, row in df.iloc[::7].iterrows():
        out = apply_plan(
            np.array(row.tokens),
            plan,
            orientation=int(row.orientation),
            src_dtype=row.src_dtype,
        )
        o = odf.loc[row.doc_id]
        assert list(out.tokens) == list(o["tokens_out"]), (chain, row.doc_id)
        assert out.dtype == o["dtype"] and out.size_bytes == o["size_bytes"]
        assert out.fmt == o["fmt"]
