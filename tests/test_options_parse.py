"""Port of the reference options-parse suite
(src/processing/tests/options_parse_tests.rs, ~90 cases): every option,
shorthand, clamp, default, and rejection path, re-asserted on the Python
parser that feeds both the Spark engine and the SQL oracle generator."""

from __future__ import annotations

import pytest

from tokforge.plans.options import (
    OptionParseError,
    parse_all_options,
    parse_boolean,
    parse_chain,
    parse_hex_color,
    parse_options_string,
)


def plan(ops: str):
    return parse_chain(ops)


# --- chain grammar (url.rs:92-100, presets.rs:91-114) ---


def test_chain_split_names_and_args():
    opts = parse_options_string("resize:fit:300:200/quality:85")
    assert opts[0].name == "resize" and opts[0].args == ["fit", "300", "200"]
    assert opts[1].name == "quality" and opts[1].args == ["85"]


def test_chain_empty_segments_skipped():
    assert len(parse_options_string("resize:fit:10//quality:85/")) == 2


def test_empty_option_name_rejected():
    with pytest.raises(OptionParseError):
        parse_options_string(":300")


# --- resize family ---


def test_resize_full():
    p = plan("resize:fill:300:200:1:1")
    assert p.resize.resizing_type == "fill"
    assert (p.resize.width, p.resize.height) == (300, 200)
    assert p.enlarge and p.extend


def test_resize_short_rs():
    p = plan("rs:fit:100")
    assert p.resize.resizing_type == "fit" and p.resize.width == 100


def test_resize_partial_args_keep_defaults():
    p = plan("resize:force")
    assert p.resize.resizing_type == "force"
    assert p.resize.width == 0 and p.resize.height == 0
    assert not p.enlarge


def test_resize_empty_args_skip_fields():
    p = plan("resize::300")
    assert p.resize.resizing_type == "" and p.resize.width == 300


def test_resize_invalid_width_rejected():
    with pytest.raises(OptionParseError):
        plan("resize:fit:abc")


def test_resize_negative_rejected():
    with pytest.raises(OptionParseError):
        plan("resize:fit:-5")


def test_resizing_type_sets_type_on_existing_resize():
    p = plan("size:100/resizing_type:fill")
    assert p.resize.resizing_type == "fill" and p.resize.width == 100


def test_resizing_type_invalid():
    with pytest.raises(OptionParseError):
        plan("resizing_type:stretch")


def test_resizing_type_requires_arg():
    with pytest.raises(OptionParseError):
        plan("rt:")


def test_size_defaults_to_fit():
    p = plan("size:150:100")
    assert p.resize.resizing_type == "fit"
    assert (p.resize.width, p.resize.height) == (150, 100)


def test_size_enlarge_extend_flags():
    p = plan("s:150:100:1:1")
    assert p.enlarge and p.extend


def test_width_height_build_default_fit_resize():
    p = plan("width:320/height:240")
    assert p.resize.resizing_type == "fit"
    assert (p.resize.width, p.resize.height) == (320, 240)


def test_width_only():
    p = plan("w:320")
    assert p.resize.width == 320 and p.resize.height == 0


def test_width_empty_is_zero():
    p = plan("w:")
    assert p.width == 0 and p.resize.resizing_type == "fit"


# --- gravity / enlarge / extend ---


def test_gravity_all_valid():
    for g in ("ce", "no", "so", "ea", "we", "noea", "nowe", "soea", "sowe"):
        assert plan(f"gravity:{g}").gravity == g


def test_gravity_invalid():
    with pytest.raises(OptionParseError):
        plan("gravity:north")


def test_gravity_requires_arg():
    with pytest.raises(OptionParseError):
        parse_all_options(parse_options_string("gravity"))


def test_enlarge_bool_parsing():
    assert plan("enlarge:1").enlarge
    assert plan("el:true").enlarge
    assert not plan("enlarge:0").enlarge
    assert not plan("enlarge:yes").enlarge  # only '1'/'true' are truthy


def test_extend_with_gravity():
    p = plan("extend:1:nowe")
    assert p.extend and p.gravity == "nowe"


def test_extend_invalid_gravity():
    with pytest.raises(OptionParseError):
        plan("extend:1:north")


# --- padding ---


def test_padding_one_arg_all_sides():
    assert plan("padding:10").padding == (10, 10, 10, 10)


def test_padding_two_args():
    assert plan("pd:10:20").padding == (10, 20, 10, 20)


def test_padding_four_args():
    assert plan("padding:1:2:3:4").padding == (1, 2, 3, 4)


def test_padding_three_args_rejected():
    with pytest.raises(OptionParseError):
        plan("padding:1:2:3")


# --- rotate / flip / auto_rotate ---


def test_rotate_valid_angles():
    for a in (0, 90, 180, 270):
        assert plan(f"rotate:{a}").rotation == a


def test_rotate_invalid_angle():
    with pytest.raises(OptionParseError):
        plan("rot:45")


def test_flip_both():
    p = plan("flip:1:1")
    assert p.flip.horizontal and p.flip.vertical


def test_flip_defaults_false():
    p = plan("fl")
    assert not p.flip.horizontal and not p.flip.vertical


def test_auto_rotate_default_true_and_toggle():
    assert plan("quality:50").auto_rotate
    assert not plan("auto_rotate:false").auto_rotate
    assert not plan("ar:0").auto_rotate


# --- crop ---


def test_crop_with_gravity():
    p = plan("crop:100:50:ce")
    assert (p.crop.width, p.crop.height, p.crop.gravity) == (100, 50, "ce")
    assert (p.crop.x, p.crop.y) == (0, 0)


def test_crop_without_gravity():
    assert plan("c:100:50").crop.gravity is None


def test_crop_requires_two_args():
    with pytest.raises(OptionParseError):
        plan("crop:100")


def test_crop_invalid_gravity():
    with pytest.raises(OptionParseError):
        plan("crop:10:10:north")


# --- format / quality ---


def test_format_spellings():
    assert plan("format:png").format == "png"
    assert plan("f:webp").format == "webp"
    assert plan("ext:avif").format == "avif"


def test_quality_clamped():
    assert plan("quality:150").quality == 100
    assert plan("q:0").quality == 1
    assert plan("q:85").quality == 85


def test_quality_invalid():
    with pytest.raises(OptionParseError):
        plan("quality:high")


def test_format_quality_pairs():
    p = plan("format_quality:jpeg:70:webp:60")
    assert p.save.format_quality == {"jpeg": 70, "webp": 60}


def test_format_quality_odd_args_rejected():
    with pytest.raises(OptionParseError):
        plan("fq:jpeg:70:webp")


# --- background ---


def test_background_rgb():
    assert plan("background:255:0:128").background == (255, 0, 128, 255)


def test_background_hex():
    assert plan("bg:ff0080").background == (255, 0, 128, 255)


def test_background_hex_bad_length():
    with pytest.raises(OptionParseError):
        plan("bg:fff")


def test_background_channel_out_of_range():
    with pytest.raises(OptionParseError):
        plan("background:300:0:0")


def test_background_alpha_applied_after():
    p = plan("background:10:20:30/background_alpha:0.5")
    assert p.background == (10, 20, 30, 128)


def test_background_alpha_applied_before():
    p = plan("bga:0.5/bg:10:20:30")
    assert p.background == (10, 20, 30, 128)


def test_background_alpha_range():
    with pytest.raises(OptionParseError):
        plan("bga:1.5")


def test_hex_color_parse_direct():
    assert parse_hex_color("#336699") == (0x33, 0x66, 0x99, 255)


# --- dpr / min dims / zoom / effects scalars ---


def test_dpr_range():
    assert plan("dpr:2.0").dpr == 2.0
    with pytest.raises(OptionParseError):
        plan("dpr:0.5")
    with pytest.raises(OptionParseError):
        plan("dpr:6")


def test_min_width_height():
    p = plan("min-width:100/min-height:50")
    assert p.min_width == 100 and p.min_height == 50
    p = plan("mw:10/mh:20")
    assert p.min_width == 10 and p.min_height == 20


def test_zoom_positive():
    assert plan("zoom:2.5").zoom == 2.5
    with pytest.raises(OptionParseError):
        plan("z:0")
    with pytest.raises(OptionParseError):
        plan("z:-1")


def test_blur_positive():
    assert plan("blur:1.5").blur == 1.5
    with pytest.raises(OptionParseError):
        plan("bl:0")


def test_sharpen_positive():
    assert plan("sh:0.7").sharpen == 0.7
    with pytest.raises(OptionParseError):
        plan("sharpen:-2")


def test_pixelate():
    assert plan("pix:8").pixelate == 8


# --- adjust / brightness / contrast / saturation ---


def test_adjust_all_three():
    p = plan("adjust:50:1.2:0.8")
    assert (p.adjust.brightness, p.adjust.contrast, p.adjust.saturation) == (50, 1.2, 0.8)


def test_adjust_partial_empty_args():
    p = plan("a::1.5")
    assert p.adjust.brightness == 0 and p.adjust.contrast == 1.5


def test_brightness_range():
    assert plan("brightness:-255").adjust.brightness == -255
    with pytest.raises(OptionParseError):
        plan("br:256")
    with pytest.raises(OptionParseError):
        plan("br:-300")


def test_contrast_saturation_merge_into_adjust():
    p = plan("br:10/co:1.1/sa:0.9")
    assert (p.adjust.brightness, p.adjust.contrast, p.adjust.saturation) == (10, 1.1, 0.9)


def test_saturation_positive():
    with pytest.raises(OptionParseError):
        plan("sa:0")


# --- watermark ---


def test_watermark_opacity_position():
    p = plan("watermark:0.5:soea")
    assert p.watermark.opacity == 0.5 and p.watermark.position == "soea"


def test_watermark_requires_two_args():
    with pytest.raises(OptionParseError):
        plan("wm:0.5")


def test_watermark_url_base64():
    import base64

    encoded = base64.urlsafe_b64encode(b"https://example.com/wm.png").decode().rstrip("=")
    assert plan(f"wmu:{encoded}").watermark_url == "https://example.com/wm.png"


# --- resizing_algorithm ---


def test_resizing_algorithm_valid():
    for a in ("nearest", "linear", "cubic", "lanczos2", "lanczos3"):
        assert plan(f"ra:{a}").resizing_algorithm == a


def test_resizing_algorithm_case_insensitive():
    assert plan("ra:NEAREST").resizing_algorithm == "nearest"


def test_resizing_algorithm_invalid():
    with pytest.raises(OptionParseError):
        plan("resizing_algorithm:bilinear")


def test_resizing_algorithm_default():
    assert plan("quality:50").resizing_algorithm == "lanczos3"


# --- save/meta options ---


def test_max_bytes():
    assert plan("max_bytes:2048").save.max_bytes == 2048
    assert plan("mb:100").save.max_bytes == 100


def test_strip_metadata_defaults_true():
    assert plan("strip_metadata").save.strip_metadata is True
    assert plan("sm:0").save.strip_metadata is False


def test_strip_color_profile():
    assert plan("scp").save.strip_color_profile is True


def test_jpeg_options():
    p = plan("jpeg_options:1:0:1::1:4")
    assert p.save.jpeg["progressive"] is True
    assert p.save.jpeg["no_subsample"] is False
    assert p.save.jpeg["optimize_scans"] is True
    assert p.save.jpeg["quant_table"] == 4


def test_png_options():
    p = plan("png_options:1:1:128")
    assert p.save.png["interlaced"] and p.save.png["quantization_colors"] == 128


def test_webp_options_parsed_but_carried():
    p = plan("webp_options:1:0:photo")
    assert p.save.webp["lossless"] is True and p.save.webp["preset"] == "photo"


def test_page_pages_disable_animation():
    p = plan("page:2/pages:3/disable_animation")
    assert (p.page, p.pages, p.disable_animation) == (2, 3, True)


def test_skip_processing_lowercased():
    assert plan("skp:PNG:webp").skip_processing == ("png", "webp")


def test_expires():
    assert plan("expires:1700000000").expires == 1700000000
    with pytest.raises(OptionParseError):
        plan("exp:soon")


def test_filename_plain_and_encoded():
    import base64

    assert plan("filename:photo.jpg").filename == "photo.jpg"
    enc = base64.urlsafe_b64encode(b"my photo.jpg").decode().rstrip("=")
    assert plan(f"fn:{enc}:1").filename == "my photo.jpg"


def test_return_attachment():
    assert plan("att").return_attachment
    assert not plan("return_attachment:0").return_attachment


def test_cachebuster():
    assert plan("cb:v2").cache_buster == "v2"


def test_raw_default_true():
    assert plan("raw").raw
    assert not plan("raw:0").raw


def test_max_src_limits():
    p = plan("msr:16.8/msfs:1048576")
    assert p.max_src_resolution == 16.8 and p.max_src_file_size == 1048576
    with pytest.raises(OptionParseError):
        plan("msr:0")


# --- unknown options ignored (options.rs:1165-1167) ---


def test_unknown_option_ignored():
    p = plan("totally_unknown:1:2/quality:40")
    assert p.quality == 40


# --- imgproxy-only spellings are NOT imgforge options: parsed as unknown ---


def test_imgproxy_spellings_ignored():
    p = plan("rotation:90")  # imgforge uses rotate/rot
    assert p.rotation is None


# --- presets (presets.rs:40-114) ---


def test_preset_expansion():
    p = parse_chain("preset:thumb/rotate:90", {"thumb": "resize:fit:100/quality:70"})
    assert p.resize.width == 100 and p.quality == 70 and p.rotation == 90


def test_default_preset_prepended():
    p = parse_chain("quality:90", {"default": "quality:50/rotate:180"})
    # URL options come after the default preset, so quality:90 wins
    assert p.quality == 90 and p.rotation == 180


def test_unknown_preset_rejected():
    with pytest.raises(OptionParseError):
        parse_chain("preset:nope", {"thumb": "quality:1"})


def test_only_presets_rejects_plain_options():
    with pytest.raises(OptionParseError):
        parse_chain("quality:90", {"thumb": "quality:1"}, only_presets=True)


def test_boolean_parse_exact():
    assert parse_boolean("1") and parse_boolean("true")
    assert not parse_boolean("TRUE") and not parse_boolean("yes")


# ---------------------------------------------------------------------------
# Output shaping: content_disposition + metadata strip (service.rs:662-674,
# save.rs:66-72) — real output effects as of round 4
# ---------------------------------------------------------------------------


def test_content_disposition_requires_filename():
    from tokforge.plans.options import content_disposition

    assert content_disposition(parse_chain("quality:90")) is None


def test_content_disposition_inline_vs_attachment():
    from tokforge.plans.options import content_disposition

    inline = parse_chain("filename:report.pdf")
    assert content_disposition(inline) == 'inline; filename="report.pdf"'
    att = parse_chain("filename:report.pdf/return_attachment:1")
    assert content_disposition(att) == 'attachment; filename="report.pdf"'


def test_content_disposition_sanitizes_header_breakers():
    # service.rs:672: backslash, double-quote, CR, LF all become '_'
    from tokforge.plans.options import Plan, content_disposition

    p = Plan(filename='a"b\\c\rd\ne')
    assert content_disposition(p) == 'inline; filename="a_b_c_d_e"'


def test_strips_metadata_either_flag():
    from tokforge.plans.options import strips_metadata

    assert not strips_metadata(parse_chain("quality:90"))
    assert strips_metadata(parse_chain("strip_metadata:true"))
    assert strips_metadata(parse_chain("strip_color_profile:true"))
    assert strips_metadata(parse_chain("sm"))  # bare shorthand -> True
