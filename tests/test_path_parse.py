"""Request-path envelope parser tests.

Part 1 ports the reference's url.rs test suite (url.rs:144-407) against
the Python scalar parser; part 2 asserts the pure-JVM column parser
(tokforge.plans.path.parse_path_col) agrees with the scalar parser on a
corpus of paths including every edge case; part 3 checks path_to_sign
feeds the existing HMAC signer (service.rs:466,475-477 semantics).
"""

from __future__ import annotations

import base64

import pyspark.sql.functions as F
import pytest

from tokforge.plans.path import INVALID_URL, PARSED_FIELDS, parse_path, parse_path_col


def b64url(s: str) -> str:
    return base64.urlsafe_b64encode(s.encode()).decode().rstrip("=")


# ---------------------------------------------------------------------------
# url.rs test-suite port (scalar reference parser)
# ---------------------------------------------------------------------------


def test_parse_path_with_resize_and_plain_url():
    # url.rs:237-252
    p = parse_path("signature123/resize:fill:300:200/plain/https://example.com/image.jpg")
    assert p["valid"]
    assert p["signature"] == "signature123"
    assert p["ops"] == "resize:fill:300:200"
    assert p["source_kind"] == "plain"
    assert p["source_raw"] == "https://example.com/image.jpg"
    assert p["source_url"] == "https://example.com/image.jpg"
    assert p["ext"] is None
    assert p["ops_full"] == "resize:fill:300:200"


def test_parse_path_with_plain_url_and_extension():
    # url.rs:255-264: @ext appends a format op
    p = parse_path("sig/resize:fill:300:200/plain/https://example.com/image.jpg@webp")
    assert p["ext"] == "webp"
    assert p["ops_full"] == "resize:fill:300:200/format:webp"
    assert p["source_raw"] == "https://example.com/image.jpg"


def test_parse_path_with_base64_url():
    # url.rs:267-281
    enc = b64url("https://example.com/image.jpg")
    p = parse_path(f"sig/resize:fill:300:200/{enc}")
    assert p["signature"] == "sig"
    assert p["source_kind"] == "base64"
    assert p["source_raw"] == enc
    assert p["source_url"] == "https://example.com/image.jpg"
    assert p["ext"] is None


def test_parse_path_with_base64_url_and_extension():
    # url.rs:284-295: .ext appends a format op
    enc = b64url("https://example.com/image.jpg")
    p = parse_path(f"sig/resize:fill:300:200/{enc}.webp")
    assert p["ext"] == "webp"
    assert p["ops_full"] == "resize:fill:300:200/format:webp"
    assert p["source_raw"] == enc


def test_parse_path_with_multiple_options():
    # url.rs:298-306
    p = parse_path("sig/resize:fill:300:200/quality:90/blur:5/plain/https://example.com/image.jpg")
    assert p["ops"] == "resize:fill:300:200/quality:90/blur:5"


def test_parse_path_no_options():
    # url.rs:309-315
    p = parse_path("sig/plain/https://example.com/image.jpg")
    assert p["signature"] == "sig"
    assert p["ops"] == ""
    assert p["ops_full"] == ""


def test_parse_path_too_short_and_empty():
    # url.rs:318-327
    assert parse_path("sig") is None
    assert parse_path("") is None


def test_parse_source_plain_multipart():
    # url.rs:348-361: plain URL spanning several '/'-separated segments
    p = parse_path("sig/plain/https://example.com/path/to/image.jpg")
    assert p["source_raw"] == "https://example.com/path/to/image.jpg"


def test_parse_source_plain_only_is_invalid():
    # url.rs:364-367: 'plain' with no following segment
    assert parse_path("sig/resize:fit:10/plain") is None


def test_decode_plain_percent_encoded():
    # url.rs:153-160
    p = parse_path("sig/plain/https%3A%2F%2Fexample.com%2Fimage.jpg")
    assert p["source_url"] == "https://example.com/image.jpg"


def test_decode_plain_preserves_plus():
    # percent_decode (url.rs:34-37) does NOT decode '+' to space
    p = parse_path("sig/plain/https%3A%2F%2Fexample.com%2Fa+b.jpg")
    assert p["source_url"] == "https://example.com/a+b.jpg"


def test_decode_base64_invalid_is_error():
    # url.rs:177-183: bad base64 decodes to None (error), parse still Some
    p = parse_path("sig/resize:fit:10/invalid!!!base64")
    assert p["valid"]
    assert p["source_url"] is None


def test_decode_base64_invalid_utf8_is_error():
    # url.rs:186-192
    enc = base64.urlsafe_b64encode(b"\xff").decode().rstrip("=")
    p = parse_path(f"sig/resize:fit:10/{enc}")
    assert p["valid"]
    assert p["source_url"] is None


def test_rsplit_uses_last_separator():
    # rpartition mirrors Rust rsplit_once: the LAST '@' / '.' splits
    p = parse_path("sig/plain/https://example.com/a@b/img.jpg@webp")
    assert p["source_raw"] == "https://example.com/a@b/img.jpg"
    assert p["ext"] == "webp"
    enc = "QUJD.def.png"  # base64 segment with dots: last '.' wins
    p2 = parse_path(f"sig/{enc}")
    assert p2["source_raw"] == "QUJD.def"
    assert p2["ext"] == "png"


def test_path_to_sign_strips_signature():
    # service.rs:475-477: "/" + everything after the first '/'
    p = parse_path("SIGX/resize:fit:10/plain/https://e.com/i.jpg")
    assert p["path_to_sign"] == "/resize:fit:10/plain/https://e.com/i.jpg"


def test_unsafe_signature_passthrough():
    p = parse_path("unsafe/plain/http://e.com/i.jpg")
    assert p["signature"] == "unsafe"


# ---------------------------------------------------------------------------
# Column-parser parity vs the scalar reference
# ---------------------------------------------------------------------------

CORPUS = [
    "signature123/resize:fill:300:200/plain/https://example.com/image.jpg",
    "sig/resize:fill:300:200/plain/https://example.com/image.jpg@webp",
    f"sig/resize:fit:64/{b64url('https://example.com/image.jpg')}",
    f"sig/rotate:90/{b64url('https://example.com/image.jpg')}.avif",
    "sig/resize:fill:300:200/quality:90/blur:5/plain/https://example.com/image.jpg",
    "sig/plain/https://example.com/image.jpg",
    "unsafe/plain/http://e.com/i.jpg",
    "sig/plain/https%3A%2F%2Fexample.com%2Fimage.jpg",
    "sig/plain/https%3A%2F%2Fexample.com%2Fa+b.jpg",
    "sig/plain/https://example.com/path/to/image.jpg",
    "sig/plain/https://example.com/a@b/img.jpg@webp",
    "sig/QUJD.def.png",
    "sig/resize:fit:10/_w",  # base64 of 0xFF: invalid UTF-8 -> null, not a crash
    f"sig/{base64.urlsafe_b64encode('héllo/ünï'.encode()).decode().rstrip('=')}",
    "sig/plain/a%FFb",  # escape of a non-UTF-8 byte: scalar None == column None
    "sig/plain/100%zz",  # malformed escape: pass-through both sides
    # MIXED valid+malformed escapes: partial decode ('aA%zz'), matching the
    # reference's percent_decode (round-5 fix; the column parser used to
    # pass the whole string through undecoded)
    "sig/plain/a%41%zz",
    "sig/plain/%%41tail%",  # '%','A','tail','%' — overlapping-scan partial decode
    "sig/plain/%4",  # lone truncated escape: literal pass-through
    # non-canonical base64 (dangling trailing bits): Rust URL_SAFE_NO_PAD
    # rejects -> null source_url on both sides (round-5 canonicality check)
    "sig/x:1/ab",
    "sig/x:1/QUJDRQ",  # 'ABCE' canonical 6-char form: stays accepted
    f"sig/{b64url('https://example.com/q')}x",  # appended char -> non-canonical
    "sig/plain/x@",  # trailing '@': empty extension (rsplit semantics)
    "sig/QUJD.",  # trailing '.': empty extension
    "sig/resize:fit:10/plain",  # invalid: plain with no URL
    "sig",  # invalid: too short
    "sig/resize:fit:10/a:b/c:d",  # invalid: no source segment at all
    "s/p:1//x",  # empty segment IS a source start (no ':' in "")
    "a/b",  # minimal valid: empty-ish everything, base64 branch
]


def test_column_parser_matches_scalar(spark):
    df = spark.createDataFrame([(p,) for p in CORPUS], "path string")
    rows = (
        df.select("path", parse_path_col(F.col("path")).alias("p"))
        .select("path", "p.*")
        .collect()
    )
    got = {r["path"]: r.asDict() for r in rows}
    for path in CORPUS:
        expected = parse_path(path)
        actual = got[path]
        if expected is None:
            assert actual["valid"] is False, path
            assert actual["error"] == INVALID_URL, path
            for f_ in PARSED_FIELDS:
                if f_ not in ("valid", "error"):
                    assert actual[f_] is None, (path, f_)
        else:
            for f_ in PARSED_FIELDS:
                assert actual[f_] == expected[f_], (path, f_, actual[f_], expected[f_])


def test_signing_roundtrip_on_path_to_sign():
    """The signature the reference validates covers salt + path_to_sign
    (url.rs:62-72); our signer over the same bytes must verify."""
    import hashlib
    import hmac as hmac_mod

    from tokforge.engine.config import EngineConfig

    cfg = EngineConfig()
    p = parse_path("PLACEHOLDER/resize:fit:10/plain/https://e.com/i.jpg")
    mac = hmac_mod.new(cfg.key, cfg.salt + p["path_to_sign"].encode(), hashlib.sha256)
    sig = base64.urlsafe_b64encode(mac.digest()).rstrip(b"=").decode()
    signed = parse_path(f"{sig}/resize:fit:10/plain/https://e.com/i.jpg")
    mac2 = hmac_mod.new(cfg.key, cfg.salt + signed["path_to_sign"].encode(), hashlib.sha256)
    expect = base64.urlsafe_b64encode(mac2.digest()).rstrip(b"=").decode()
    assert hmac_mod.compare_digest(expect, signed["signature"])


def test_gated_query_shape(spark):
    """The driver row: builds signed envelopes, parses them back, and
    verifies the extracted signature over the extracted path_to_sign —
    sig_ok must match the corruption pattern exactly."""
    from tokforge.engine.queries import q_path_parse

    out = q_path_parse(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) > 0
    by_valid = [r for r in rows if not r["valid"]]
    assert by_valid and all(r["error"] == INVALID_URL for r in by_valid)
    assert all(r["sig_ok"] is None for r in by_valid)
    ok = [r for r in rows if r["valid"]]
    assert all(r["source_url"].startswith("https://cdn.example.com/") for r in ok)
    kinds = {r["source_kind"] for r in ok}
    assert kinds == {"plain", "base64"}
    for r in ok:
        d = int(r["doc_id"])
        expect = not (d % 6 == 5 or d % 9 == 4)  # unsafe / corrupted rejected
        assert r["sig_ok"] == expect, r
    assert any(r["sig_ok"] for r in ok) and any(not r["sig_ok"] for r in ok)
