"""Port of pipeline_tests.rs: multi-op chains end-to-end through
apply_plan, asserting final length/dtype/content like the reference's
full process_image assertions (pipeline_tests.rs:133-154)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.fixtures import ramp, solid
from tokforge.operators.kernel import TransformError, apply_plan
from tokforge.plans.options import parse_chain


def run(chain: str, tokens, orientation=1, src_dtype="int32", default_format=None):
    return apply_plan(
        np.asarray(tokens, dtype=np.int64),
        parse_chain(chain),
        orientation=orientation,
        src_dtype=src_dtype,
        default_format=default_format,
    )


def test_full_chain_length():
    # crop 64 of 100, fit 32, pad 2+2 -> 36
    out = run("crop:64:0:ce/resize:fit:32/padding:2/format:png", ramp(100))
    assert len(out.tokens) == 36 and out.dtype == "int32"


def test_canonical_order_crop_before_resize():
    # crop first (center 8 of ramp(16) = [4..11]), then fit 4 -> [4,5,6,7]
    out = run("auto_rotate:false/resize:fit:4/crop:8:0:ce/format:png", ramp(16))
    assert list(out.tokens) == [4, 5, 6, 7]


def test_enlarge_gate_skips_growth():
    out = run("resize:fit:100/format:png", ramp(10))
    assert len(out.tokens) == 10  # not enlarged


def test_enlarge_allows_growth():
    out = run("resize:fit:20:0:1/format:png", ramp(10))
    assert len(out.tokens) == 20


def test_extend_after_gated_resize():
    # resize skipped (enlarge false) but extend pads to the resolved target
    out = run("resize:fit:20/extend:1:ce/background:0:0:7/format:png", ramp(10))
    assert len(out.tokens) == 20
    bg = 7  # (0<<16 | 0<<8 | 7) % VOCAB
    assert list(out.tokens[:5]) == [bg] * 5 and list(out.tokens[15:]) == [bg] * 5


def test_dpr_scales_resize_and_padding():
    out = run("dpr:2/resize:fit:8/padding:3/format:png", ramp(32))
    # resize target 16, padding 6+6 -> 28
    assert len(out.tokens) == 28


def test_exif_applied_by_default():
    out = run("format:png", [0, 1, 2, 3, 4, 5], orientation=2)
    assert list(out.tokens) == [5, 4, 3, 2, 1, 0]


def test_exif_disabled():
    out = run("auto_rotate:false/format:png", [0, 1, 2, 3, 4, 5], orientation=2)
    assert list(out.tokens) == [0, 1, 2, 3, 4, 5]


def test_raw_bypasses_everything():
    out = run("raw/resize:fit:2/blur:3", ramp(10), src_dtype="int16")
    assert list(out.tokens) == list(range(10))
    assert out.dtype == "int16" and out.fmt == "int16"


def test_skip_processing_matching_source():
    out = run("skip_processing:int16/resize:fit:2", ramp(10), src_dtype="int16")
    assert len(out.tokens) == 10  # bypassed


def test_skip_processing_non_matching_source():
    out = run("skip_processing:int16/resize:fit:2/format:png", ramp(10), src_dtype="int32")
    assert len(out.tokens) == 2


def test_default_format_fallback_chain():
    # no format in chain: explicit default wins, else src dtype
    out = run("crop:4:0", ramp(10), src_dtype="uint8")
    assert out.fmt == "uint8" and out.dtype == "int16"
    out2 = run("crop:4:0", ramp(10), src_dtype="uint8", default_format="png")
    assert out2.fmt == "png" and out2.dtype == "int32"


def test_jpeg_default_quality_85():
    out = run("format:jpeg", [0, 5, 9, 10])
    assert list(out.tokens) == [0, 3, 9, 9]  # step 3
    assert out.quality == 85


def test_format_quality_map_used_when_no_quality():
    out = run("format_quality:jpeg:100/format:jpeg", [0, 5, 9, 10])
    assert list(out.tokens) == [0, 5, 9, 10]


def test_explicit_quality_wins():
    out = run("quality:100/format_quality:jpeg:10/format:jpeg", [0, 5, 9, 10])
    assert list(out.tokens) == [0, 5, 9, 10]


def test_background_flatten_only_for_jpeg():
    chain = "watermark:1:ce/background:0:0:9/quality:100"
    j = run(chain + "/format:jpeg", solid(8, 5))
    p = run(chain + "/format:png", solid(8, 5))
    assert max(p.tokens) >= 50300  # sentinels survive png
    assert max(j.tokens) < 50300  # flattened for jpeg
    assert 9 in list(j.tokens)


def test_invalid_resize_dims_error():
    with pytest.raises(TransformError):
        run("resize:fit", ramp(4))


def test_watermark_after_pixelate_order():
    # pixelate first then watermark: sentinel block lands on pixelated data
    out = run("pixelate:4/watermark:1:we/format:png", ramp(40))
    assert max(out.tokens) >= 50300


def test_empty_input():
    out = run("format:png", [])
    assert len(out.tokens) == 0 and out.size_bytes == 0
