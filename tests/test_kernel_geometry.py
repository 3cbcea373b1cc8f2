"""Port of the reference geometry suites (resize_tests.rs 372 LoC,
effects_tests.rs crop/rotate/flip/zoom/min-dims parts,
padding_extend_tests.rs) as token-array golden tests against the numpy
kernel — exact equality, mirroring the reference's pixel-exact checks."""

from __future__ import annotations

import numpy as np
import pytest

from tests.fixtures import quadrant, ramp, solid
from tokforge.operators.kernel import (
    TransformError,
    gravity_offset,
    op_crop,
    op_extend,
    op_flip,
    op_min_length,
    op_padding,
    op_resize,
    op_rotate,
    op_zoom,
    resample_nearest,
    resolve_resize_length,
)


def eq(a, b):
    assert list(a) == list(b), f"{list(a)} != {list(b)}"


# --- resolve dimensions (transform.rs:159-197; resize_tests.rs zero-dim) ---


def test_resolve_width_wins():
    assert resolve_resize_length("fit", 200, 150) == 200


def test_resolve_zero_width_derives_from_height():
    # 1-D aspect is 1: fill width-only analog of 400x300 -> 200x150
    assert resolve_resize_length("fill", 0, 150) == 150


def test_resolve_both_zero_rejected():
    with pytest.raises(TransformError):
        resolve_resize_length("fit", 0, 0)


# --- fit (resize_to_fit, transform.rs:317-340) ---


def test_fit_truncates():
    eq(op_resize(ramp(10), "fit", 4, None, False), [0, 1, 2, 3])


def test_fit_identity_when_equal():
    eq(op_resize(ramp(4), "fit", 4, None, False), [0, 1, 2, 3])


def test_fit_enlarge_resamples():
    # nearest-index upsample: out[i] = t[(i*4)//8]
    eq(op_resize(ramp(4), "fit", 8, None, True), [0, 0, 1, 1, 2, 2, 3, 3])


# --- fill (resize_to_fill, transform.rs:246-297) ---


def test_fill_center_cut():
    # extra=6, center offset 3
    eq(op_resize(ramp(10), "fill", 4, "ce", False), [3, 4, 5, 6])


def test_fill_west_cut():
    eq(op_resize(ramp(10), "fill", 4, "we", False), [0, 1, 2, 3])


def test_fill_east_cut():
    eq(op_resize(ramp(10), "fill", 4, "ea", False), [6, 7, 8, 9])


def test_fill_default_gravity_is_center():
    eq(op_resize(ramp(10), "fill", 4, None, False), [3, 4, 5, 6])


def test_fill_corner_gravities_use_x_rule():
    eq(op_resize(ramp(10), "fill", 4, "nowe", False), [0, 1, 2, 3])
    eq(op_resize(ramp(10), "fill", 4, "soea", False), [6, 7, 8, 9])
    # north/south fall to the center x-rule (transform.rs:139-156)
    eq(op_resize(ramp(10), "fill", 4, "no", False), [3, 4, 5, 6])


def test_fill_odd_extra_floors():
    # extra=5 -> offset 2
    eq(op_resize(ramp(9), "fill", 4, "ce", False), [2, 3, 4, 5])


# --- force (resize_to_force, transform.rs:300-314) ---


def test_force_truncate():
    eq(op_resize(ramp(10), "force", 3, None, False), [0, 1, 2])


def test_force_repeat_pad():
    eq(op_resize(ramp(3), "force", 7, None, True), [0, 1, 2, 0, 1, 2, 0])


def test_force_identity_short_circuit():
    t = ramp(5)
    assert op_resize(t, "force", 5, None, False) is t


# --- auto (transform.rs:220-237: fill when orientations match) ---


def test_auto_uses_fill_when_source_longer():
    eq(op_resize(ramp(10), "auto", 4, "we", False), [0, 1, 2, 3])


def test_auto_uses_fit_when_source_shorter():
    eq(op_resize(ramp(4), "auto", 8, None, True), [0, 0, 1, 1, 2, 2, 3, 3])


def test_unknown_resize_type_rejected():
    with pytest.raises(TransformError):
        op_resize(ramp(4), "stretch", 2, None, False)


# --- crop (crop_image, transform.rs:117-156; effects_tests.rs) ---


def test_crop_zero_width_full():
    eq(op_crop(ramp(6), 0, None), [0, 1, 2, 3, 4, 5])


def test_crop_clamps_to_source():
    eq(op_crop(ramp(4), 100, None), [0, 1, 2, 3])


def test_crop_no_gravity_origin_zero():
    eq(op_crop(ramp(8), 3, None), [0, 1, 2])


def test_crop_gravity_center():
    eq(op_crop(ramp(8), 4, "ce"), [2, 3, 4, 5])


def test_crop_gravity_east_west():
    eq(op_crop(ramp(8), 3, "ea"), [5, 6, 7])
    eq(op_crop(ramp(8), 3, "we"), [0, 1, 2])


def test_crop_quadrant_segments():
    t = quadrant(16)
    eq(op_crop(t, 4, "we"), [1, 1, 1, 1])
    eq(op_crop(t, 4, "ea"), [4, 4, 4, 4])


# --- gravity offset rule (transform.rs:139-156) ---


def test_gravity_offset_rule():
    assert gravity_offset("we", 9) == 0
    assert gravity_offset("ea", 9) == 9
    assert gravity_offset("ce", 9) == 4
    assert gravity_offset("no", 9) == 4
    assert gravity_offset("sowe", 9) == 0
    assert gravity_offset("noea", 9) == 9


# --- extend (extend_image, transform.rs:343-383; padding_extend_tests.rs) ---


def test_extend_center_places_background():
    eq(op_extend(ramp(4), 8, "ce", 99), [99, 99, 0, 1, 2, 3, 99, 99])


def test_extend_west_east():
    eq(op_extend(ramp(4), 6, "we", 99), [0, 1, 2, 3, 99, 99])
    eq(op_extend(ramp(4), 6, "ea", 99), [99, 99, 0, 1, 2, 3])


def test_extend_smaller_target_rejected():
    with pytest.raises(TransformError):
        op_extend(ramp(6), 4, "ce", 0)


def test_extend_odd_extra_floors():
    eq(op_extend(ramp(3), 6, "ce", 9), [9, 0, 1, 2, 9, 9])


# --- padding (apply_padding, transform.rs:386-409) ---


def test_padding_left_right():
    eq(op_padding(ramp(3), 2, 1, 7), [7, 7, 0, 1, 2, 7])


def test_padding_zero():
    eq(op_padding(ramp(3), 0, 0, 7), [0, 1, 2])


# --- rotate (apply_rotation; SURVEY.md cyclic-shift analog) ---


def test_rotate_90_is_quarter_shift():
    eq(op_rotate(ramp(8), 90), [2, 3, 4, 5, 6, 7, 0, 1])


def test_rotate_180_is_half_shift():
    eq(op_rotate(ramp(8), 180), [4, 5, 6, 7, 0, 1, 2, 3])


def test_rotate_270_is_three_quarter_shift():
    eq(op_rotate(ramp(8), 270), [6, 7, 0, 1, 2, 3, 4, 5])


def test_rotate_0_identity():
    eq(op_rotate(ramp(8), 0), list(range(8)))


def test_rotate_full_cycle_identity():
    t = ramp(8)
    out = op_rotate(op_rotate(op_rotate(op_rotate(t, 90), 90), 90), 90)
    eq(out, list(t))


def test_rotate_non_multiple_length_floors():
    # n=6: 90 deg -> shift 6//4 = 1
    eq(op_rotate(ramp(6), 90), [1, 2, 3, 4, 5, 0])


# --- flip (apply_flip) ---


def test_flip_horizontal_reverses():
    eq(op_flip(ramp(5), True, False), [4, 3, 2, 1, 0])


def test_flip_vertical_identity_1d():
    eq(op_flip(ramp(5), False, True), [0, 1, 2, 3, 4])


def test_flip_both():
    eq(op_flip(ramp(5), True, True), [4, 3, 2, 1, 0])


# --- zoom (apply_zoom, transform.rs:584-589) ---


def test_zoom_doubles():
    eq(op_zoom(ramp(3), 2.0), [0, 0, 1, 1, 2, 2])


def test_zoom_halves():
    eq(op_zoom(ramp(6), 0.5), [0, 2, 4])


def test_zoom_rounds_target():
    # 5 * 1.5 = 7.5 -> 8
    assert len(op_zoom(ramp(5), 1.5)) == 8


# --- min dims (apply_min_dimensions, transform.rs:546-581) ---


def test_min_width_upscales():
    eq(op_min_length(ramp(3), 6, None), [0, 0, 1, 1, 2, 2])


def test_min_length_noop_when_met():
    t = ramp(10)
    eq(op_min_length(t, 5, None), list(t))


def test_min_takes_larger_of_both():
    assert len(op_min_length(ramp(4), 6, 8)) == 8


# --- resample invariants ---


def test_resample_identity():
    t = ramp(7)
    assert resample_nearest(t, 7) is t


def test_resample_preserves_solid():
    eq(resample_nearest(solid(5, 3), 11), [3] * 11)


def test_resample_downsample_indices():
    # out[i] = t[(i*10)//4] = t[0], t[2], t[5], t[7]
    eq(resample_nearest(ramp(10), 4), [0, 2, 5, 7])


# --- lanczos windowed-sinc (reference DEFAULT algorithm, options.rs:567-610;
#     kernel cost model doc/5.1_resizing_algorithms.md:224-232) ---


def _lanczos_reference(t, target, a):
    """Independent scalar reimplementation (math.sin, no shared helpers):
    guards the kernel against a self-consistent bug in lanczos_taps."""
    import math

    n = len(t)
    out = []
    for i in range(target):
        lo = (i * n) // target
        frac = ((i * n) % target) / target
        if frac == 0.0:
            out.append(int(t[lo]))
            continue
        num = 0.0
        den = 0.0
        for j in range(-(a - 1), a + 1):
            x = float(j) - frac
            px = math.pi * x
            w = (a * math.sin(px)) * math.sin(px / a) / (px * px)
            p = min(max(lo + j, 0), n - 1)
            num += w * float(t[p])
            den += w
        v = math.floor(num / den + 0.5)
        out.append(int(min(max(v, 0), 50256)))
    return out


def test_lanczos3_matches_independent_sinc():
    from tokforge.operators.kernel import resample

    t = (ramp(10) * 977) % 50257
    eq(resample(t, 23, "lanczos3"), _lanczos_reference(t, 23, 3))


def test_lanczos2_matches_independent_sinc():
    from tokforge.operators.kernel import resample

    t = (ramp(16) * 3163) % 50257
    eq(resample(t, 7, "lanczos2"), _lanczos_reference(t, 7, 2))


def test_lanczos_integer_grid_is_identity_taps():
    # frac == 0 positions reproduce source tokens exactly (2x upsample:
    # every even output index has frac 0 -> t[i//2])
    from tokforge.operators.kernel import resample

    t = (ramp(8) * 12345) % 50257
    out = resample(t, 16, "lanczos3")
    eq(out[::2], t)


def test_lanczos_preserves_constant():
    # normalized weights: a solid sequence stays solid at any scale
    from tokforge.operators.kernel import resample

    for target in (3, 7, 10, 31):
        eq(resample(solid(10, 777), target, "lanczos3"), [777] * target)
        eq(resample(solid(10, 777), target, "lanczos2"), [777] * target)


def test_lanczos_not_cubic_alias():
    # the round-2 alias is gone: all three interpolators disagree somewhere
    from tokforge.operators.kernel import resample

    t = (ramp(50) * 733) % 50257
    l3 = list(resample(t, 117, "lanczos3"))
    l2 = list(resample(t, 117, "lanczos2"))
    cu = list(resample(t, 117, "cubic"))
    assert l3 != cu and l2 != cu and l3 != l2
