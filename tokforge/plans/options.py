"""imgforge-compatible ops-chain DSL: parse `name:arg:arg/.../name:arg`
strings into a typed :class:`Plan`.

Grammar, option names, shorthands, defaults, clamps and rejection rules
mirror the reference parser (reference: src/processing/options.rs:624-1182,
src/url.rs:75-142, src/processing/presets.rs:40-114) re-specified for the
token domain.  This module is pure Python (no Spark) so it doubles as the
oracle used by the pytest port of the reference's options-parse suite.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass, field, replace
from typing import Optional


class OptionParseError(ValueError):
    """Typed parse failure (reference: options.rs:22-61 OptionParseError)."""


# ---------------------------------------------------------------------------
# Raw option (reference: options.rs:6-12 ProcessingOption)
# ---------------------------------------------------------------------------


@dataclass
class ProcessingOption:
    name: str
    args: list[str] = field(default_factory=list)


def parse_options_string(options_str: str) -> list[ProcessingOption]:
    """Split an options chain ``a:1:2/b:3`` into raw options.

    Reference: presets.rs:91-114 ``parse_options_string`` and
    url.rs:92-100 (same colon/slash grammar).
    """
    options: list[ProcessingOption] = []
    for part in options_str.split("/"):
        part = part.strip()
        if not part:
            continue
        segments = part.split(":")
        name = segments[0]
        if not name:
            raise OptionParseError(f"Invalid option: {part}")
        options.append(ProcessingOption(name=name, args=segments[1:]))
    return options


def expand_presets(
    options: list[ProcessingOption],
    presets: dict[str, list[ProcessingOption]],
    only_presets: bool = False,
) -> list[ProcessingOption]:
    """Macro-expand ``preset:name`` references (reference: presets.rs:40-85).

    The ``default`` preset, when present, is prepended.  ``only_presets``
    locks the chain down to preset references only.
    """
    expanded: list[ProcessingOption] = []
    has_preset_reference = False

    if "default" in presets:
        expanded.extend(presets["default"])

    for option in options:
        if option.name in ("preset", "pr"):
            has_preset_reference = True
            if not option.args:
                raise OptionParseError("preset option requires a name")
            name = option.args[0]
            if name not in presets:
                raise OptionParseError(f"Unknown preset: {name}")
            expanded.extend(presets[name])
        elif only_presets:
            raise OptionParseError(f"Only presets are allowed, got option: {option.name}")
        else:
            expanded.append(option)

    if only_presets and not has_preset_reference and "default" not in presets and expanded:
        raise OptionParseError("A preset is required")

    return expanded


# ---------------------------------------------------------------------------
# Typed plan (reference: options.rs:488-565 ParsedOptions)
# ---------------------------------------------------------------------------


@dataclass
class Resize:
    resizing_type: str = ""
    width: int = 0
    height: int = 0


@dataclass
class Crop:
    x: int = 0
    y: int = 0
    width: int = 0
    height: int = 0
    gravity: Optional[str] = None


@dataclass
class Flip:
    horizontal: bool = False
    vertical: bool = False


@dataclass
class Adjust:
    brightness: int = 0
    contrast: float = 1.0
    saturation: float = 1.0


@dataclass
class Watermark:
    opacity: float = 0.0
    position: str = "ce"


@dataclass
class SaveOptions:
    format_quality: dict[str, int] = field(default_factory=dict)
    max_bytes: Optional[int] = None
    strip_metadata: Optional[bool] = None
    strip_color_profile: Optional[bool] = None
    # Encoder knobs are parsed-and-carried (fidelity with the reference,
    # which parses webp options but cannot apply them: save.rs:114-118).
    jpeg: dict = field(default_factory=dict)
    png: dict = field(default_factory=dict)
    webp: dict = field(default_factory=dict)
    avif: dict = field(default_factory=dict)


VALID_ROTATIONS = (0, 90, 180, 270)
VALID_RESIZING_TYPES = ("fill", "fit", "force", "auto")
VALID_GRAVITIES = ("ce", "no", "so", "ea", "we", "noea", "nowe", "soea", "sowe")
VALID_RESIZING_ALGORITHMS = ("nearest", "linear", "cubic", "lanczos2", "lanczos3")


@dataclass
class Plan:
    """The validated logical plan for one request (ParsedOptions analog)."""

    resize: Optional[Resize] = None
    blur: Optional[float] = None
    crop: Optional[Crop] = None
    format: Optional[str] = None
    quality: Optional[int] = None
    background: Optional[tuple[int, int, int, int]] = None
    width: Optional[int] = None
    height: Optional[int] = None
    gravity: Optional[str] = None
    enlarge: bool = False
    extend: bool = False
    padding: Optional[tuple[int, int, int, int]] = None
    rotation: Optional[int] = None
    flip: Optional[Flip] = None
    auto_rotate: bool = True
    raw: bool = False
    max_src_resolution: Optional[float] = None
    max_src_file_size: Optional[int] = None
    cache_buster: Optional[str] = None
    expires: Optional[int] = None
    filename: Optional[str] = None
    return_attachment: bool = False
    dpr: Optional[float] = 1.0
    min_width: Optional[int] = None
    min_height: Optional[int] = None
    zoom: Optional[float] = None
    sharpen: Optional[float] = None
    pixelate: Optional[int] = None
    watermark: Optional[Watermark] = None
    watermark_url: Optional[str] = None
    resizing_algorithm: Optional[str] = "lanczos3"
    background_alpha: Optional[float] = None
    adjust: Optional[Adjust] = None
    save: SaveOptions = field(default_factory=SaveOptions)
    page: Optional[int] = None
    pages: Optional[int] = None
    disable_animation: bool = False
    skip_processing: tuple[str, ...] = ()


# ---------------------------------------------------------------------------
# Scalar parsers (reference: options.rs:69-95, 315-345)
# ---------------------------------------------------------------------------


def parse_boolean(s: str) -> bool:
    """'1'/'true' (case-sensitive) are true (reference: processing/utils.rs:53-55)."""
    return s in ("1", "true")


def _parse_int(value: str, option: str, *, minimum: int | None = 0) -> int:
    try:
        parsed = int(value, 10)
    except ValueError as exc:
        raise OptionParseError(f"Invalid integer for {option}: {value}") from exc
    if minimum is not None and parsed < minimum:
        raise OptionParseError(f"Invalid integer for {option}: {value}")
    return parsed


def _parse_float(value: str, option: str) -> float:
    try:
        return float(value)
    except ValueError as exc:
        raise OptionParseError(f"Invalid float for {option}: {value}") from exc


def _parse_positive_float(value: str, option: str) -> float:
    parsed = _parse_float(value, option)
    if not (parsed == parsed and abs(parsed) != float("inf")) or parsed <= 0.0:
        raise OptionParseError(f"{option} must be a finite positive number")
    return parsed


def _parse_unit_float(value: str, option: str) -> float:
    parsed = _parse_float(value, option)
    if not (0.0 <= parsed <= 1.0):
        raise OptionParseError(f"{option} must be a finite number between 0 and 1")
    return parsed


def _parse_quality(value: str, option: str) -> int:
    parsed = _parse_int(value, option)
    return min(max(parsed, 1), 100)


def _parse_brightness(value: str) -> int:
    parsed = _parse_int(value, "brightness", minimum=None)
    if not (-255 <= parsed <= 255):
        raise OptionParseError("brightness must be between -255 and 255")
    return parsed


def parse_hex_color(hex_str: str) -> tuple[int, int, int, int]:
    """RGB(A=255) from 6 hex digits (reference: processing/utils.rs:26-42)."""
    hex_str = hex_str.lstrip("#")
    if len(hex_str) != 6:
        raise OptionParseError("hex color must contain exactly six digits")
    try:
        r = int(hex_str[0:2], 16)
        g = int(hex_str[2:4], 16)
        b = int(hex_str[4:6], 16)
    except ValueError as exc:
        raise OptionParseError("invalid channel in hex color") from exc
    return (r, g, b, 255)


def _optional_bool(args: list[str], index: int) -> Optional[bool]:
    if index < len(args) and args[index] != "":
        return parse_boolean(args[index])
    return None


def _decode_base64url(value: str, option: str) -> str:
    pad = "=" * (-len(value) % 4)
    try:
        return base64.urlsafe_b64decode(value + pad).decode("utf-8")
    except Exception as exc:  # noqa: BLE001 - single rejection path
        raise OptionParseError(f"Invalid base64 for {option}") from exc


def _arg(args: list[str], i: int) -> Optional[str]:
    """args[i] if present and non-empty, else None."""
    if i < len(args) and args[i] != "":
        return args[i]
    return None


# ---------------------------------------------------------------------------
# The big match (reference: options.rs:624-1182 parse_all_options)
# ---------------------------------------------------------------------------


def parse_all_options(options: list[ProcessingOption]) -> Plan:  # noqa: C901
    plan = Plan()

    for option in options:
        name, args = option.name, option.args

        if name in ("resize", "rs"):
            store = plan.resize is not None
            resize = plan.resize if plan.resize is not None else Resize()
            plan.resize = None
            if (a := _arg(args, 0)) is not None:
                resize.resizing_type = a
                store = True
            if (a := _arg(args, 1)) is not None:
                resize.width = _parse_int(a, "resize width")
                store = True
            if (a := _arg(args, 2)) is not None:
                resize.height = _parse_int(a, "resize height")
                store = True
            if (a := _arg(args, 3)) is not None:
                plan.enlarge = parse_boolean(a)
            if (a := _arg(args, 4)) is not None:
                plan.extend = parse_boolean(a)
            if store:
                plan.resize = resize

        elif name in ("resizing_type", "rt"):
            a = _arg(args, 0)
            if a is None:
                raise OptionParseError("resizing_type option requires one argument")
            if a not in VALID_RESIZING_TYPES:
                raise OptionParseError("resizing_type must be one of: fill, fit, force, auto")
            if plan.resize is None:
                plan.resize = Resize()
            plan.resize.resizing_type = a

        elif name in ("size", "s"):
            store = plan.resize is not None
            resize = plan.resize if plan.resize is not None else Resize()
            plan.resize = None
            wh_set = False
            if (a := _arg(args, 0)) is not None:
                resize.width = _parse_int(a, "size width")
                store = wh_set = True
            if (a := _arg(args, 1)) is not None:
                resize.height = _parse_int(a, "size height")
                store = wh_set = True
            if (a := _arg(args, 2)) is not None:
                plan.enlarge = parse_boolean(a)
            if (a := _arg(args, 3)) is not None:
                plan.extend = parse_boolean(a)
            if store and (wh_set or resize.resizing_type == ""):
                resize.resizing_type = "fit"
            if store:
                plan.resize = resize

        elif name in ("width", "w"):
            a = args[0] if args else "0"
            plan.width = 0 if a == "" else _parse_int(a, "width")

        elif name in ("height", "h"):
            a = args[0] if args else "0"
            plan.height = 0 if a == "" else _parse_int(a, "height")

        elif name in ("gravity", "g"):
            if not args:
                raise OptionParseError("gravity option requires one argument")
            if args[0] not in VALID_GRAVITIES:
                raise OptionParseError(
                    "gravity must be one of: ce, no, so, ea, we, noea, nowe, soea, sowe"
                )
            plan.gravity = args[0]

        elif name in ("enlarge", "el"):
            if not args:
                raise OptionParseError("enlarge option requires one argument")
            plan.enlarge = parse_boolean(args[0])

        elif name in ("extend", "ex"):
            if not args:
                raise OptionParseError("extend option requires one argument")
            plan.extend = parse_boolean(args[0])
            if (a := _arg(args, 1)) is not None:
                if a not in VALID_GRAVITIES:
                    raise OptionParseError(
                        "extend gravity must be one of: ce, no, so, ea, we, noea, nowe, soea, sowe"
                    )
                plan.gravity = a

        elif name in ("padding", "pd"):
            if not args:
                raise OptionParseError("padding option requires at least one argument")
            values = [_parse_int(v, "padding") for v in args]
            if len(values) == 1:
                plan.padding = (values[0],) * 4
            elif len(values) == 2:
                plan.padding = (values[0], values[1], values[0], values[1])
            elif len(values) == 4:
                plan.padding = tuple(values)  # type: ignore[assignment]
            else:
                raise OptionParseError("padding must have 1, 2, or 4 arguments")

        elif name in ("rotate", "rot"):
            if not args:
                raise OptionParseError("rotation option requires one argument")
            rotation = _parse_int(args[0], "rotation")
            if rotation not in VALID_ROTATIONS:
                raise OptionParseError("rotation must be one of: 0, 90, 180, 270")
            plan.rotation = rotation

        elif name in ("flip", "fl"):
            plan.flip = Flip(
                horizontal=_optional_bool(args, 0) or False,
                vertical=_optional_bool(args, 1) or False,
            )

        elif name in ("auto_rotate", "ar"):
            if not args:
                raise OptionParseError("auto_rotate option requires one argument")
            plan.auto_rotate = parse_boolean(args[0])

        elif name == "raw":
            a = _arg(args, 0)
            plan.raw = parse_boolean(a) if a is not None else True

        elif name in ("blur", "bl"):
            if not args:
                raise OptionParseError("blur option requires one argument: sigma")
            plan.blur = _parse_positive_float(args[0], "blur")

        elif name in ("crop", "c"):
            if len(args) < 2:
                raise OptionParseError(
                    "crop option requires at least two arguments: width, height"
                )
            gravity = _arg(args, 2)
            if gravity is not None and gravity not in VALID_GRAVITIES:
                raise OptionParseError(
                    "crop gravity must be one of: ce, no, so, ea, we, noea, nowe, soea, sowe"
                )
            # 1-D ergonomics: empty width/height args mean 0 (the reference
            # requires parseable ints; in the token domain height is the
            # unused y-axis, so `crop:64::ce` is accepted as a superset).
            plan.crop = Crop(
                x=0,
                y=0,
                width=_parse_int(args[0], "crop width") if args[0] != "" else 0,
                height=_parse_int(args[1], "crop height") if args[1] != "" else 0,
                gravity=gravity,
            )

        elif name in ("format", "f", "ext"):
            if not args:
                raise OptionParseError("format option requires one argument")
            plan.format = args[0]

        elif name in ("quality", "q"):
            if not args:
                raise OptionParseError("quality option requires one argument")
            plan.quality = _parse_quality(args[0], "quality")

        elif name in ("format_quality", "fq"):
            if len(args) < 2 or len(args) % 2 != 0:
                raise OptionParseError("format_quality option requires format/quality pairs")
            for i in range(0, len(args), 2):
                plan.save.format_quality[args[i].lower()] = _parse_quality(
                    args[i + 1], "format_quality"
                )

        elif name in ("background", "bg"):
            if not args:
                plan.background = None
                continue
            if len(args) >= 3:
                background = [
                    _parse_int(args[0], "background red channel"),
                    _parse_int(args[1], "background green channel"),
                    _parse_int(args[2], "background blue channel"),
                    255,
                ]
                for channel in background[:3]:
                    if channel > 255:
                        raise OptionParseError("background channel must be 0-255")
            else:
                background = list(parse_hex_color(args[0]))
            if plan.background_alpha is not None:
                background[3] = int(plan.background_alpha * 255.0 + 0.5)
            plan.background = tuple(background)  # type: ignore[assignment]

        elif name in ("background_alpha", "bga"):
            if not args:
                raise OptionParseError("background_alpha option requires one argument")
            alpha = _parse_unit_float(args[0], "background_alpha")
            plan.background_alpha = alpha
            if plan.background is not None:
                bg = list(plan.background)
                bg[3] = int(alpha * 255.0 + 0.5)
                plan.background = tuple(bg)  # type: ignore[assignment]

        elif name in ("max_src_resolution", "msr"):
            if not args:
                raise OptionParseError("max_src_resolution option requires one argument")
            mp = _parse_float(args[0], "max_src_resolution")
            if mp <= 0:
                raise OptionParseError("max_src_resolution must be positive")
            plan.max_src_resolution = mp

        elif name in ("max_src_file_size", "msfs"):
            if not args:
                raise OptionParseError("max_src_file_size option requires one argument")
            size = _parse_int(args[0], "max_src_file_size")
            if size <= 0:
                raise OptionParseError("max_src_file_size must be positive")
            plan.max_src_file_size = size

        elif name in ("cachebuster", "cb"):
            if not args:
                raise OptionParseError("cachebuster option requires one argument")
            plan.cache_buster = args[0]

        elif name == "dpr":
            if not args:
                raise OptionParseError("dpr option requires one argument")
            dpr = _parse_float(args[0], "dpr")
            if not (1.0 <= dpr <= 5.0):
                raise OptionParseError("dpr value must be between 1.0 and 5.0")
            plan.dpr = dpr

        elif name in ("min-width", "mw"):
            if not args:
                raise OptionParseError("min-width option requires one argument")
            plan.min_width = _parse_int(args[0], "min-width")

        elif name in ("min-height", "mh"):
            if not args:
                raise OptionParseError("min-height option requires one argument")
            plan.min_height = _parse_int(args[0], "min-height")

        elif name in ("zoom", "z"):
            if not args:
                raise OptionParseError("zoom option requires one argument")
            plan.zoom = _parse_positive_float(args[0], "zoom")

        elif name in ("sharpen", "sh"):
            if not args:
                raise OptionParseError("sharpen option requires one argument")
            plan.sharpen = _parse_positive_float(args[0], "sharpen")

        elif name in ("pixelate", "pix"):
            if not args:
                raise OptionParseError("pixelate option requires one argument")
            plan.pixelate = _parse_int(args[0], "pixelate")

        elif name in ("adjust", "a"):
            adjust = plan.adjust if plan.adjust is not None else Adjust()
            if (a := _arg(args, 0)) is not None:
                adjust.brightness = _parse_brightness(a)
            if (a := _arg(args, 1)) is not None:
                adjust.contrast = _parse_positive_float(a, "contrast")
            if (a := _arg(args, 2)) is not None:
                adjust.saturation = _parse_positive_float(a, "saturation")
            plan.adjust = adjust

        elif name in ("brightness", "br"):
            if not args:
                raise OptionParseError("brightness option requires one argument")
            adjust = plan.adjust if plan.adjust is not None else Adjust()
            adjust.brightness = _parse_brightness(args[0])
            plan.adjust = adjust

        elif name in ("contrast", "co"):
            if not args:
                raise OptionParseError("contrast option requires one argument")
            adjust = plan.adjust if plan.adjust is not None else Adjust()
            adjust.contrast = _parse_positive_float(args[0], "contrast")
            plan.adjust = adjust

        elif name in ("saturation", "sa"):
            if not args:
                raise OptionParseError("saturation option requires one argument")
            adjust = plan.adjust if plan.adjust is not None else Adjust()
            adjust.saturation = _parse_positive_float(args[0], "saturation")
            plan.adjust = adjust

        elif name in ("watermark", "wm"):
            if len(args) < 2:
                raise OptionParseError(
                    "watermark option requires two arguments: opacity, position"
                )
            plan.watermark = Watermark(
                opacity=_parse_float(args[0], "watermark opacity"),
                position=args[1],
            )

        elif name in ("watermark_url", "wmu"):
            if not args:
                raise OptionParseError("watermark_url option requires one argument")
            plan.watermark_url = _decode_base64url(args[0], "watermark_url")

        elif name in ("resizing_algorithm", "ra"):
            if not args:
                raise OptionParseError("resizing_algorithm option requires one argument")
            algorithm = args[0].lower()
            if algorithm not in VALID_RESIZING_ALGORITHMS:
                raise OptionParseError(
                    f"Invalid resizing algorithm: {algorithm}. Must be one of: "
                    "nearest, linear, cubic, lanczos2, lanczos3"
                )
            plan.resizing_algorithm = algorithm

        elif name in ("max_bytes", "mb"):
            if not args:
                raise OptionParseError("max_bytes option requires one argument")
            plan.save.max_bytes = _parse_int(args[0], "max_bytes")

        elif name in ("strip_metadata", "sm"):
            plan.save.strip_metadata = parse_boolean(args[0]) if args else True

        elif name in ("strip_color_profile", "scp"):
            plan.save.strip_color_profile = parse_boolean(args[0]) if args else True

        elif name in ("jpeg_options", "jpgo"):
            plan.save.jpeg = {
                "progressive": _optional_bool(args, 0),
                "no_subsample": _optional_bool(args, 1),
                "trellis_quant": _optional_bool(args, 2),
                "overshoot_deringing": _optional_bool(args, 3),
                "optimize_scans": _optional_bool(args, 4),
            }
            if (a := _arg(args, 5)) is not None:
                plan.save.jpeg["quant_table"] = _parse_int(a, "jpeg quant_table")

        elif name in ("png_options", "pngo"):
            plan.save.png = {
                "interlaced": _optional_bool(args, 0),
                "quantize": _optional_bool(args, 1),
            }
            if (a := _arg(args, 2)) is not None:
                plan.save.png["quantization_colors"] = _parse_int(a, "png quantization_colors")

        elif name in ("webp_options", "webpo"):
            plan.save.webp = {
                "lossless": _optional_bool(args, 0),
                "smart_subsample": _optional_bool(args, 1),
            }
            if (a := _arg(args, 2)) is not None:
                plan.save.webp["preset"] = a.lower()

        elif name in ("avif_options", "avifo"):
            plan.save.avif = {"no_subsample": _optional_bool(args, 0)}

        elif name in ("page", "pg"):
            if not args:
                raise OptionParseError("page option requires one argument")
            plan.page = _parse_int(args[0], "page")

        elif name in ("pages", "pgs"):
            if not args:
                raise OptionParseError("pages option requires one argument")
            plan.pages = _parse_int(args[0], "pages")

        elif name in ("disable_animation", "da"):
            plan.disable_animation = parse_boolean(args[0]) if args else True

        elif name in ("skip_processing", "skp"):
            if not args:
                raise OptionParseError("skip_processing option requires at least one argument")
            plan.skip_processing = tuple(a.lower() for a in args)

        elif name in ("expires", "exp"):
            if not args:
                raise OptionParseError("expires option requires one argument")
            plan.expires = _parse_int(args[0], "expires timestamp")

        elif name in ("filename", "fn"):
            if not args:
                raise OptionParseError("filename option requires one argument")
            encoded = parse_boolean(args[1]) if len(args) > 1 else False
            plan.filename = _decode_base64url(args[0], "filename") if encoded else args[0]

        elif name in ("return_attachment", "att"):
            plan.return_attachment = parse_boolean(args[0]) if args else True

        else:
            # Unknown options are ignored (reference: options.rs:1165-1167).
            pass

    # Default resize type is `fit` when bare width/height were given
    # (reference: options.rs:1171-1179).
    if plan.resize is None and (plan.width is not None or plan.height is not None):
        plan.resize = Resize(
            resizing_type="fit",
            width=plan.width or 0,
            height=plan.height or 0,
        )

    return plan


def content_disposition(plan: Plan) -> Optional[str]:
    """Content-Disposition header value shaped by filename /
    return_attachment (reference: service.rs:662-674
    ``content_disposition_for``): None without a filename; the filename is
    sanitized by replacing backslash, double-quote, CR and LF with '_'."""
    if plan.filename is None:
        return None
    disposition = "attachment" if plan.return_attachment else "inline"
    safe = plan.filename
    for ch in ('\\', '"', "\r", "\n"):
        safe = safe.replace(ch, "_")
    return f'{disposition}; filename="{safe}"'


def strips_metadata(plan: Plan) -> bool:
    """True when the encode drops source metadata (reference:
    save.rs:66-72 ``metadata_keep`` -> ForeignKeep::None)."""
    return bool(plan.save.strip_metadata) or bool(plan.save.strip_color_profile)


def parse_chain(
    ops: str,
    presets: dict[str, str] | None = None,
    only_presets: bool = False,
) -> Plan:
    """Parse a full chain string (optionally expanding presets) into a Plan."""
    raw = parse_options_string(ops)
    if presets:
        preset_map = {k: parse_options_string(v) for k, v in presets.items()}
        raw = expand_presets(raw, preset_map, only_presets)
    return parse_all_options(raw)


def copy_plan(plan: Plan) -> Plan:
    """Shallow-ish copy safe for the kernel's DPR rewrite."""
    new = replace(plan)
    if plan.resize is not None:
        new.resize = replace(plan.resize)
    if plan.crop is not None:
        new.crop = replace(plan.crop)
    if plan.flip is not None:
        new.flip = replace(plan.flip)
    if plan.adjust is not None:
        new.adjust = replace(plan.adjust)
    if plan.watermark is not None:
        new.watermark = replace(plan.watermark)
    return new
