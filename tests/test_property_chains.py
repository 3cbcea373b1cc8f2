"""Property-based parity: random ops chains through the per-row kernel,
the rectangular kernel, and (sampled) the DuckDB oracle must agree
token-for-token.  Hypothesis explores plan-merge and edge interactions the
hand-picked chain lists cannot enumerate."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMALL
from tokforge.operators.kernel import apply_plan
from tokforge.operators.kernel_rect import apply_plan_rect
from tokforge.plans.options import parse_chain

# Widen the fuzz after any kernel/oracle change (CLAUDE.md):
#   TOKFORGE_FUZZ_EXAMPLES=500 python -m pytest tests/test_property_chains.py
import os

_EXAMPLES = int(os.environ.get("TOKFORGE_FUZZ_EXAMPLES", "60"))

_GRAVITIES = ["no", "so", "ea", "we", "noea", "nowe", "soea", "sowe", "ce"]
_FORMATS = ["png", "jpeg", "gif", "webp", "tiff", "avif", "heif", "int16", "uint8", "int64"]
_ALGOS = ["nearest", "linear", "cubic", "lanczos2", "lanczos3"]


@st.composite
def chains(draw):
    ops: list[str] = []
    if draw(st.booleans()):
        rt = draw(st.sampled_from(["fit", "fill", "force", "auto"]))
        w = draw(st.integers(0, 200))
        h = draw(st.integers(0, 200)) if w == 0 else draw(st.integers(0, 200))
        if w == 0 and h == 0:
            w = 1
        enlarge = draw(st.integers(0, 1))
        extend = draw(st.integers(0, 1))
        ops.append(f"resize:{rt}:{w}:{h}:{enlarge}:{extend}")
    if draw(st.booleans()):
        ops.append(f"gravity:{draw(st.sampled_from(_GRAVITIES))}")
    if draw(st.booleans()):
        ops.append(f"ra:{draw(st.sampled_from(_ALGOS))}")
    if draw(st.booleans()):
        w = draw(st.integers(0, 150))
        ops.append(f"crop:{w}:0:{draw(st.sampled_from(_GRAVITIES))}")
    if draw(st.booleans()):
        ops.append(f"zoom:{draw(st.floats(0.1, 3.0, allow_nan=False)):.2f}")
    if draw(st.booleans()):
        ops.append(f"min-width:{draw(st.integers(1, 180))}")
    if draw(st.booleans()):
        ops.append(f"padding:{draw(st.integers(0, 9))}:{draw(st.integers(0, 9))}")
    if draw(st.booleans()):
        ops.append(f"rotate:{draw(st.sampled_from([0, 90, 180, 270]))}")
    if draw(st.booleans()):
        ops.append(f"flip:{draw(st.integers(0, 1))}:{draw(st.integers(0, 1))}")
    if draw(st.booleans()):
        ops.append(f"brightness:{draw(st.integers(-255, 255))}")
    if draw(st.booleans()):
        ops.append(f"contrast:{draw(st.floats(0.05, 3.0, allow_nan=False)):.2f}")
    if draw(st.booleans()):
        ops.append(f"saturation:{draw(st.floats(0.05, 3.0, allow_nan=False)):.2f}")
    if draw(st.booleans()):
        ops.append(f"blur:{draw(st.floats(0.1, 6.0, allow_nan=False)):.2f}")
    if draw(st.booleans()):
        ops.append(f"sharpen:{draw(st.floats(0.05, 12.0, allow_nan=False)):.2f}")
    if draw(st.booleans()):
        ops.append(f"pixelate:{draw(st.integers(1, 12))}")
    if draw(st.booleans()):
        op = draw(st.floats(0.0, 1.0, allow_nan=False))
        ops.append(f"watermark:{op:.2f}:{draw(st.sampled_from(_GRAVITIES))}")
    if draw(st.booleans()):
        ops.append(
            f"background:{draw(st.integers(0, 255))}:{draw(st.integers(0, 255))}:"
            f"{draw(st.integers(0, 255))}"
        )
    if draw(st.booleans()):
        ops.append(f"quality:{draw(st.integers(1, 100))}")
    if draw(st.booleans()):
        ops.append(f"dpr:{draw(st.floats(1.0, 4.0, allow_nan=False)):.2f}")
    if draw(st.booleans()):
        # encoder knobs (round 4): palette fold and progressive layout
        # only fire for their formats — drawing them unconditionally also
        # fuzzes the must-be-a-no-op path on every other format
        ops.append(
            f"png_options:{draw(st.integers(0, 1))}:{draw(st.integers(0, 1))}:"
            f"{draw(st.sampled_from([2, 3, 8, 16, 255, 256]))}"
        )
    if draw(st.booleans()):
        ops.append(f"jpeg_options:{draw(st.integers(0, 1))}")
    if draw(st.booleans()):
        # round 5: avif subsample knob — fires only for format:avif
        # (default ON there); a no-op everywhere else
        ops.append(f"avif_options:{draw(st.integers(0, 1))}")
    if draw(st.booleans()):
        ops.append(f"max_bytes:{draw(st.sampled_from([40, 120, 400]))}")
    if draw(st.booleans()):
        ops.append(f"format:{draw(st.sampled_from(_FORMATS))}")
    if not ops:
        ops.append("crop:8:0")
    return "/".join(ops)


def _tokens(n: int, seed: int) -> np.ndarray:
    return ((seed * 7919 + np.arange(n, dtype=np.int64) * 104729) % 50257).astype(
        np.int64
    )


@given(chain=chains(), n=st.sampled_from([0, 1, 6, 32, 100]), orient=st.integers(1, 8))
@settings(max_examples=_EXAMPLES, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_rect_equals_rowwise_random_chain(chain, n, orient):
    from tokforge.plans.options import OptionParseError

    try:
        plan = parse_chain(chain)
    except OptionParseError:
        assume(False)  # strategy produced a parser-invalid combination
    t = _tokens(n, seed=17)
    row = apply_plan(t, plan, orientation=orient, src_dtype="int32")
    rect = apply_plan_rect(
        t[None, :].copy(),
        plan,
        orientations=np.array([orient]),
        src_dtype="int32",
    )
    assert list(rect.tokens[0]) == list(row.tokens), chain
    assert rect.dtype == row.dtype and rect.fmt == row.fmt
    assert int(rect.size_bytes[0]) == row.size_bytes
    assert int(rect.quality[0]) == row.quality


@pytest.fixture(scope="module")
def oracle_con():
    from tokforge.sources.requests import sql_requests_cte

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'"
    )
    df = con.execute(
        f"WITH {sql_requests_cte()} "
        "SELECT doc_id, orientation, src_dtype, tokens FROM req ORDER BY doc_num LIMIT 24"
    ).df()
    return con, df


@given(chain=chains())
@settings(max_examples=max(_EXAMPLES // 2, 25), deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_oracle_matches_kernel_random_chain(oracle_con, chain):
    from tokforge.engine.oracle import oracle_transform_sql

    from tokforge.plans.options import OptionParseError

    con, df = oracle_con
    try:
        sql = oracle_transform_sql(chain)
    except OptionParseError:
        assume(False)
    except ValueError:
        # generator-rejected combination by design (e.g. max_bytes with the
        # per-row source-dtype fallback format) — kernel-vs-rect equality
        # still covers these via test_rect_equals_rowwise_random_chain
        assume(False)
    odf = con.execute(sql).df().set_index("doc_id")
    plan = parse_chain(chain)
    for _, r in df.iloc[::5].iterrows():
        out = apply_plan(
            np.array(r.tokens),
            plan,
            orientation=int(r.orientation),
            src_dtype=r.src_dtype,
        )
        o = odf.loc[r.doc_id]
        assert list(out.tokens) == list(o["tokens_out"]), (chain, r.doc_id)
        assert out.size_bytes == o["size_bytes"] and out.quality == o["quality"]
