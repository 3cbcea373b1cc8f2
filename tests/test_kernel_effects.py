"""Port of effects/exif/watermark/encode suites (effects_tests.rs,
exif_tests.rs, watermark_tests.rs, save.rs behavior) against the numpy
kernel with exact golden values."""

from __future__ import annotations

import numpy as np
import pytest

from tests.fixtures import orientation6, ramp, solid
from tokforge.constants import SENTINEL_BASE, VOCAB
from tokforge.operators.kernel import (
    TransformError,
    encoded_size_bytes,
    op_blur,
    op_brightness,
    op_contrast,
    op_encode,
    op_exif_orientation,
    op_flatten,
    op_pixelate,
    op_quantize,
    op_saturation,
    op_sharpen,
    op_watermark,
    quality_step,
    watermark_tokens,
)


def eq(a, b):
    assert list(a) == list(b), f"{list(a)} != {list(b)}"


# --- blur (moving average, window 2*ceil(sigma)+1) ---


def test_blur_solid_invariant():
    eq(op_blur(solid(6, 100), 2.0), [100] * 6)


def test_blur_window3_golden():
    # sigma 1 -> window 3, replicate edges
    # t = [0, 100, 0]: means floor-rounded: (0+0+100)/3=33.33->33, 100/3..
    eq(op_blur(np.array([0, 100, 0]), 1.0), [33, 33, 33])


def test_blur_ramp_preserved_interior():
    # moving mean of a ramp is the ramp except replicated edges
    eq(op_blur(ramp(6) * 10, 1.0), [3, 10, 20, 30, 40, 47])


def test_blur_clamps_to_vocab():
    out = op_blur(np.array([VOCAB - 1, VOCAB - 1, VOCAB - 1]), 1.0)
    assert max(out) <= VOCAB - 1


# --- sharpen (2t - blur, sigma clamped 0.1..10) ---


def test_sharpen_solid_invariant():
    eq(op_sharpen(solid(5, 50), 1.0), [50] * 5)


def test_sharpen_edge_boost():
    # t=[0,0,100,0,0], w=3 blur=[0,33,33,33,0] -> 2t-b clamped at 0
    eq(op_sharpen(np.array([0, 0, 100, 0, 0]), 1.0), [0, 0, 167, 0, 0])


def test_sharpen_sigma_clamped_low():
    # sigma 0.01 clamps to 0.1 -> window 3 (not 1)
    a = op_sharpen(np.array([0, 0, 100, 0, 0]), 0.01)
    b = op_sharpen(np.array([0, 0, 100, 0, 0]), 0.1)
    eq(a, b)


# --- pixelate (block-first) ---


def test_pixelate_blocks():
    eq(op_pixelate(ramp(7), 3), [0, 0, 0, 3, 3, 3, 6])


def test_pixelate_one_identity():
    eq(op_pixelate(ramp(5), 1), list(range(5)))


# --- adjust ---


def test_brightness_shift_clamp():
    eq(op_brightness(np.array([0, 100, VOCAB - 1]), 50), [50, 150, VOCAB - 1])
    eq(op_brightness(np.array([10, 100]), -50), [0, 50])


def test_contrast_about_mean():
    # t=[0,100], mean=50, c=2 -> [clamp(50+floor(-100+0.5)), 50+100]
    eq(op_contrast(np.array([0, 100]), 2.0), [0, 150])


def test_contrast_identity():
    eq(op_contrast(np.array([10, 20, 30]), 1.0), [10, 20, 30])


def test_saturation_toward_mean():
    # t=[0,100], m=50, s=0.5 -> floor(0.5*t + 0.5*50 + .5) = [25, 75]
    eq(op_saturation(np.array([0, 100]), 0.5), [25, 75])


def test_saturation_zero_is_mean():
    eq(op_saturation(np.array([0, 100]), 0.0), [50, 50])


# --- exif orientations (exif_tests.rs: all 8 branches) ---


def test_exif_all_orientations_golden():
    t = orientation6()
    eq(op_exif_orientation(t, 1), [0, 1, 2, 3, 4, 5])
    eq(op_exif_orientation(t, 2), [5, 4, 3, 2, 1, 0])  # flip H
    eq(op_exif_orientation(t, 3), [3, 4, 5, 0, 1, 2])  # rot 180
    eq(op_exif_orientation(t, 4), [0, 1, 2, 3, 4, 5])  # flip V = id
    eq(op_exif_orientation(t, 5), [0, 5, 4, 3, 2, 1])  # rot90 then flip H
    eq(op_exif_orientation(t, 6), [1, 2, 3, 4, 5, 0])  # rot 90 (shift 1)
    eq(op_exif_orientation(t, 7), [3, 2, 1, 0, 5, 4])  # rot270 then flip H
    eq(op_exif_orientation(t, 8), [4, 5, 0, 1, 2, 3])  # rot 270 (shift 4)


def test_exif_invertibility_pairs():
    t = ramp(8)
    # orientation 3 applied twice = identity (180+180)
    eq(op_exif_orientation(op_exif_orientation(t, 3), 3), list(t))


# --- watermark (watermark_tests.rs: positions, opacity 0/1) ---


def test_watermark_opacity_one_exact_sentinels():
    t = solid(40, 5)
    out = op_watermark(t, 1.0, "nowe")
    # wm_len = ceil(40/4) = 10, margin = 2, x = 2
    wm = watermark_tokens(10)
    eq(out[2:12], list(wm))
    assert all(v == 5 for v in out[:2]) and all(v == 5 for v in out[12:])


def test_watermark_opacity_zero_identity():
    t = ramp(40)
    eq(op_watermark(t, 0.0, "ce"), list(t))


def test_watermark_positions_x_rule():
    t = solid(40, 0)
    # margin=2, wm_len=10
    for pos, x in [("nowe", 2), ("we", 2), ("sowe", 2),
                   ("noea", 28), ("ea", 28), ("soea", 28),
                   ("ce", 15), ("no", 15), ("so", 15)]:
        out = op_watermark(t, 1.0, pos)
        nz = np.nonzero(np.asarray(out) >= SENTINEL_BASE)[0]
        assert nz[0] == x and len(nz) == 10, pos


def test_watermark_blend_half():
    t = solid(8, 100)
    out = op_watermark(t, 0.5, "ce")
    # wm_len=2, margin=0 (floor(8*.05+.5)=0), x=(8-2)//2=3
    w0, w1 = SENTINEL_BASE + 0, SENTINEL_BASE + 1
    assert out[3] == int(np.floor(0.5 * w0 + 0.5 * 100 + 0.5))
    assert out[4] == int(np.floor(0.5 * w1 + 0.5 * 100 + 0.5))


def test_watermark_longer_than_source_clamps():
    out = op_watermark(ramp(3), 1.0, "ce")
    assert len(out) == 3


# --- flatten ---


def test_flatten_replaces_sentinels():
    t = np.array([5, SENTINEL_BASE, SENTINEL_BASE + 50, 9])
    eq(op_flatten(t, 42), [5, 42, 42, 9])


# --- encode / quality / formats (save.rs analogs) ---


def test_quality_step_table():
    assert quality_step(100) == 1
    assert quality_step(85) == 3
    assert quality_step(50) == 6
    assert quality_step(1) == 10 + 1


def test_quantize():
    eq(op_quantize(np.array([0, 5, 9, 10, 14]), 5), [0, 5, 5, 10, 10])


def test_encode_jpeg_quantizes():
    r = op_encode(np.array([0, 5, 9, 10]), "jpeg", 85, None)
    eq(r.tokens, [0, 3, 9, 9])
    assert r.dtype == "int32"


def test_encode_png_lossless():
    r = op_encode(np.array([0, 5, 9, 10]), "png", 85, None)
    eq(r.tokens, [0, 5, 9, 10])


def test_encode_webp_saturates():
    r = op_encode(np.array([40000, 10]), "webp", 85, None)
    eq(r.tokens, [32767, 10])
    assert r.dtype == "int16"


def test_encode_gif_mod256():
    r = op_encode(np.array([256, 257, 10]), "gif", 85, None)
    eq(r.tokens, [0, 1, 10])


def test_encode_tiff_int64():
    assert op_encode(ramp(3), "tiff", 85, None).dtype == "int64"


def test_encode_unsupported_rejected():
    with pytest.raises(TransformError):
        op_encode(ramp(3), "bmp", 85, None)


def test_encoded_size_runs():
    assert encoded_size_bytes(np.array([1, 1, 2, 2, 2, 3]), 4) == 12
    assert encoded_size_bytes(np.array([], dtype=np.int64), 4) == 0


def test_avif_subsample_default_on():
    """AVIF subsamples BY DEFAULT (reference save.rs:145-151 Auto):
    quality:100 -> no quantize, so the only effect is each odd position
    taking its even neighbor (4:2:0 pair-sharing analog)."""
    r = op_encode(np.array([10, 20, 30, 40, 50]), "avif", 100, None)
    eq(r.tokens, [10, 10, 30, 30, 50])


def test_avif_no_subsample_knob():
    """avif_options:1 (no_subsample) turns the subsample off — output
    matches the bare quantize path."""
    from tokforge.plans.options import parse_chain

    plan = parse_chain("avif_options:1/quality:100/format:avif")
    r = op_encode(np.array([10, 20, 30, 40, 50]), "avif", 100, None, plan.save)
    eq(r.tokens, [10, 20, 30, 40, 50])


def test_avif_subsample_non_avif_noop():
    # the knob is format-scoped: jpeg output ignores avif options entirely
    from tokforge.plans.options import parse_chain

    plan = parse_chain("avif_options:0/quality:100/format:jpeg")
    r = op_encode(np.array([10, 20, 30, 40, 50]), "jpeg", 100, None, plan.save)
    eq(r.tokens, [10, 20, 30, 40, 50])


def test_avif_subsample_shrinks_encoded_size():
    # pair-sharing halves run count for distinct-valued input: the knob has
    # a REAL effect on the encoder's size accounting (and max_bytes loop)
    t = np.arange(10) * 1000
    on = op_encode(t, "avif", 100, None)
    from tokforge.plans.options import parse_chain

    off_plan = parse_chain("avif_options:1/format:avif")
    off = op_encode(t, "avif", 100, None, off_plan.save)
    assert on.size_bytes < off.size_bytes


def test_max_bytes_quality_loop():
    # distinct values: size = n*4 = 40 bytes; quantizing merges runs
    t = np.arange(10) * 2
    r = op_encode(t, "jpeg", 95, max_bytes=20)
    assert r.size_bytes <= 20
    assert r.quality < 95


def test_max_bytes_stops_at_quality_one():
    t = np.arange(100) * 1000  # even heavy quantization keeps runs distinct
    r = op_encode(t, "jpeg", 85, max_bytes=8)
    assert r.quality == 1
