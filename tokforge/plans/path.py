"""Request-path envelope parsing: ``/<signature>/<opt>...:<arg>/.../<source>``.

Reference parity: ``/root/reference/src/url.rs:75-142`` (``parse_path`` +
``parse_source_url_path``), ``service.rs:475-477`` (``build_path_to_sign``).
The grammar:

- the path splits on '/'; the first segment is the signature;
- option segments are everything up to the first segment that is either
  ``plain`` or contains no ':' — each option is ``name:arg1:arg2...``;
- the source is either ``plain/<url...>[@ext]`` (percent-encoded, may span
  many '/'-separated segments) or ``<base64url>[.ext]`` (URL-safe base64,
  no padding);
- a trailing extension appends a ``format:<ext>`` processing option;
- fewer than 2 segments, or no source segment, is invalid
  (service.rs:448-452 -> "Invalid URL format").

Two implementations with asserted parity (tests/test_path_parse.py):

- :func:`parse_path` — plain-Python scalar, the unit-test reference
  (ports the url.rs:144-407 test suite);
- :func:`parse_path_col` — pure JVM Spark column expressions (split /
  transform-with-index / array_min / url_decode / unbase64), zero Python
  in the executor path, so parsing a 10^12-row request stream stays
  whole-stage-codegen and scales with the scan.
"""

from __future__ import annotations

import base64
import binascii
import re
from urllib.parse import unquote

# Rust URL_SAFE_NO_PAD is strict: any byte outside the url-safe alphabet
# (incl. '=' padding, '+', '/') is a decode error, as is length % 4 == 1.
_B64URL_RE = re.compile(r"^[A-Za-z0-9_-]*$")
# a '%' not followed by two hex digits is an invalid escape; percent_decode
# passes invalid escapes through as literal bytes (url.rs:34-37)
_MALFORMED_PCT = r"%(?![0-9A-Fa-f]{2})"

from pyspark.sql import Column
from pyspark.sql import functions as F

INVALID_URL = "Invalid URL format"

PARSED_FIELDS = (
    "valid",
    "signature",
    "ops",
    "ext",
    "ops_full",
    "source_kind",
    "source_raw",
    "source_url",
    "path_to_sign",
    "error",
)


# ---------------------------------------------------------------------------
# Python reference implementation (url.rs:75-142 port)
# ---------------------------------------------------------------------------


def _decode_source(kind: str, raw: str) -> str | None:
    """Decode the still-encoded source (url.rs:30-46). Returns None on a
    decode error (invalid base64 / invalid UTF-8 / bad percent escape)."""
    if kind == "plain":
        try:
            return unquote(raw, errors="strict")
        except UnicodeDecodeError:
            return None
    if not _B64URL_RE.fullmatch(raw) or len(raw) % 4 == 1:
        return None
    try:
        pad = "=" * (-len(raw) % 4)
        data = base64.urlsafe_b64decode(raw + pad)
    except (binascii.Error, ValueError):
        return None
    # Rust URL_SAFE_NO_PAD is canonical-strict: nonzero trailing bits
    # (e.g. 'ab', whose last char carries 4 dangling bits) are a decode
    # error, while Python's decoder silently drops them — re-encode and
    # compare to reject the non-canonical forms the reference rejects.
    if base64.urlsafe_b64encode(data).decode().rstrip("=") != raw:
        return None
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return None


def parse_path(path: str) -> dict | None:
    """Scalar reference parser; returns None for an invalid envelope
    (mirrors url.rs parse_path returning Option)."""
    parts = path.split("/")
    if len(parts) < 2:
        return None
    signature = parts[0]
    rest = parts[1:]

    src_i = next(
        (i for i, s in enumerate(rest) if s == "plain" or ":" not in s), len(rest)
    )
    opts = rest[:src_i]
    src_parts = rest[src_i:]
    if not src_parts:
        return None

    if src_parts[0] == "plain":
        if len(src_parts) < 2:
            return None
        kind = "plain"
        src_path = "/".join(src_parts[1:])
        raw, sep, ext = src_path.rpartition("@")
        if not sep:
            raw, ext = src_path, None
    else:
        kind = "base64"
        src_path = "/".join(src_parts)
        raw, sep, ext = src_path.rpartition(".")
        if not sep:
            raw, ext = src_path, None

    ops = "/".join(opts)
    fmt_op = f"format:{ext}" if ext is not None else None
    ops_full = "/".join(x for x in (ops, fmt_op) if x) if fmt_op else ops
    slash = path.find("/")
    return {
        "valid": True,
        "signature": signature,
        "ops": ops,
        "ext": ext,
        "ops_full": ops_full,
        "source_kind": kind,
        "source_raw": raw,
        "source_url": _decode_source(kind, raw),
        "path_to_sign": "/" + path[slash + 1 :],
        "error": None,
    }


# ---------------------------------------------------------------------------
# Spark column implementation — pure JVM expressions
# ---------------------------------------------------------------------------


def parse_path_col(path: Column) -> Column:
    """Parse a request-path string column into a struct of
    :data:`PARSED_FIELDS`; invalid envelopes yield null fields with
    ``error = 'Invalid URL format'``.

    Everything is built-in expression algebra (no UDF): split, slice,
    transform-with-index + array_min for the first-source-segment scan,
    url_decode for percent decoding ('+' pre-escaped to %2B to match the
    reference's percent_decode, which leaves '+' alone), and
    unbase64(translate(.., '-_', '+/')) for URL-safe base64.
    """
    parts = F.split(path, "/", -1)
    n = F.size(parts)
    signature = F.element_at(parts, 1)
    rest = F.slice(parts, 2, F.greatest(n - 1, F.lit(0)))

    # 0-based index of the first segment that is 'plain' or has no ':'
    # (url.rs:85-88); null when no segment qualifies -> no source -> invalid
    idxs = F.transform(
        rest,
        lambda x, i: F.when((x == F.lit("plain")) | (~x.contains(":")), i),
    )
    src_i = F.array_min(idxs)

    opts = F.slice(rest, 1, F.coalesce(src_i, F.lit(0)))
    ops = F.array_join(opts, "/")
    src_parts = F.slice(rest, src_i + 1, F.size(rest) - src_i)
    n_src = F.size(src_parts)
    is_plain = F.element_at(src_parts, 1) == F.lit("plain")

    # plain branch: join segments after 'plain', rsplit at the LAST '@'
    plain_path = F.array_join(F.slice(src_parts, 2, F.greatest(n_src - 1, F.lit(0))), "/")
    p_arr = F.split(plain_path, "@", -1)
    p_has_ext = F.size(p_arr) > 1
    p_raw = F.when(
        p_has_ext, F.array_join(F.slice(p_arr, 1, F.size(p_arr) - 1), "@")
    ).otherwise(plain_path)
    p_ext = F.when(p_has_ext, F.element_at(p_arr, -1))

    # base64 branch: join all source segments, rsplit at the LAST '.'
    b_path = F.array_join(src_parts, "/")
    b_arr = F.split(b_path, "[.]", -1)
    b_has_ext = F.size(b_arr) > 1
    b_raw = F.when(
        b_has_ext, F.array_join(F.slice(b_arr, 1, F.size(b_arr) - 1), ".")
    ).otherwise(b_path)
    b_ext = F.when(b_has_ext, F.element_at(b_arr, -1))

    source_kind = F.when(is_plain, F.lit("plain")).otherwise(F.lit("base64"))
    source_raw = F.when(is_plain, p_raw).otherwise(b_raw)
    ext = F.when(is_plain, p_ext).otherwise(b_ext)
    # plain decode: pre-escape '+' so url_decode's form-urlencoded '+'->' '
    # rule cannot fire (the reference's percent_decode leaves '+' alone,
    # url.rs:34-37), then pre-escape every MALFORMED '%' (one not followed
    # by two hex digits) to '%25' so url_decode renders it literally while
    # still decoding the valid escapes around it — exactly the reference's
    # partial-decode behavior ('a%41%zz' -> 'aA%zz'), matching the scalar
    # parser (Python unquote has the same pass-through rule).
    # Escapes of bytes that are NOT valid UTF-8 (e.g. %FF): java's decoder
    # substitutes U+FFFD where Rust's decode_utf8 errors — map a decode
    # that INTRODUCED replacement chars to null, matching the scalar
    # parser (only a URL that literally percent-encodes U+FFFD itself
    # would be over-nulled; accepted corner, asserted in the test corpus).
    decoded_plain = F.url_decode(
        F.regexp_replace(
            F.replace(p_raw, F.lit("+"), F.lit("%2B")), _MALFORMED_PCT, "%25"
        )
    )
    plain_url = F.when(
        decoded_plain.contains("�") & ~p_raw.contains("�"),
        F.lit(None).cast("string"),
    ).otherwise(decoded_plain)
    # base64 decode: strict url-safe alphabet + length check mirrors Rust
    # URL_SAFE_NO_PAD (invalid -> null source_url, the decode-error
    # analog).  The binary -> string CAST never throws (raw bytes pass
    # through), and try_validate_utf8 nulls invalid UTF-8 — per-ROW
    # failure semantics; F.decode(..., 'UTF-8') would abort the whole job
    # on one malformed request at 10^12-row scale.  URL_SAFE_NO_PAD is
    # also canonical-strict: re-encode the decoded bytes and require an
    # exact round-trip, rejecting dangling-bit forms like 'ab' that the
    # lenient JVM/Python decoders silently accept (scalar parser: same
    # re-encode check in _decode_source).
    b64_ok = b_raw.rlike("^[A-Za-z0-9_-]*$") & (F.length(b_raw) % 4 != 1)
    b64_bytes = F.unbase64(F.translate(b_raw, "-_", "+/"))
    b64_canonical = (
        F.translate(
            F.regexp_replace(F.base64(b64_bytes), "=+$", ""), "+/", "-_"
        )
        == b_raw
    )
    b64_url = F.when(
        b64_ok,
        F.when(b64_canonical, F.try_validate_utf8(b64_bytes.cast("string"))),
    )
    source_url = F.when(is_plain, plain_url).otherwise(b64_url)

    fmt_op = F.concat(F.lit("format:"), ext)
    ops_full = F.when(ext.isNull(), ops).otherwise(
        F.when(ops == F.lit(""), fmt_op).otherwise(F.concat(ops, F.lit("/"), fmt_op))
    )
    slash = F.instr(path, "/")
    path_to_sign = F.concat(F.lit("/"), path.substr(slash + 1, F.length(path)))

    valid = (
        (n >= 2)
        & src_i.isNotNull()
        & (n_src >= 1)
        & (~is_plain | (n_src >= 2))
    )
    null_s = F.lit(None).cast("string")

    def gated(col: Column) -> Column:
        return F.when(valid, col)

    return F.struct(
        valid.alias("valid"),
        gated(signature).alias("signature"),
        gated(ops).alias("ops"),
        gated(ext).alias("ext"),
        gated(ops_full).alias("ops_full"),
        gated(source_kind).alias("source_kind"),
        gated(source_raw).alias("source_raw"),
        gated(source_url).alias("source_url"),
        gated(path_to_sign).alias("path_to_sign"),
        F.when(~valid, F.lit(INVALID_URL)).otherwise(null_s).alias("error"),
    )
