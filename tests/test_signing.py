"""Port of the signature-validation suite (src/url.rs:144-407 tests;
service.rs:448-470 gate): valid / invalid / wrong-path / unsafe."""

from __future__ import annotations

import pandas as pd

from tokforge.functions.signing import (
    canonical_path,
    sign_path,
    validate_signature,
    verify_series,
)

KEY = b"secretkey"
SALT = b"salt"


def test_sign_verify_roundtrip():
    path = canonical_path("resize:fit:10/format:png", "doc-1")
    sig = sign_path(KEY, SALT, path)
    assert validate_signature(KEY, SALT, sig, path)


def test_wrong_path_rejected():
    sig = sign_path(KEY, SALT, "/a/b")
    assert not validate_signature(KEY, SALT, sig, "/a/c")


def test_wrong_key_rejected():
    sig = sign_path(KEY, SALT, "/a/b")
    assert not validate_signature(b"otherkey", SALT, sig, "/a/b")


def test_wrong_salt_rejected():
    sig = sign_path(KEY, SALT, "/a/b")
    assert not validate_signature(KEY, b"pepper", sig, "/a/b")


def test_malformed_base64_rejected():
    assert not validate_signature(KEY, SALT, "!!!not-base64!!!", "/a/b")


def test_tampered_signature_rejected():
    sig = sign_path(KEY, SALT, "/a/b")
    assert not validate_signature(KEY, SALT, sig + "x", "/a/b")


def test_signature_is_urlsafe_no_pad():
    sig = sign_path(KEY, SALT, "/ops/doc")
    assert "=" not in sig and "+" not in sig and "/" not in sig


def test_verify_series_unsafe_gate():
    ops = pd.Series(["a", "a"])
    doc = pd.Series(["1", "2"])
    sig = pd.Series(["unsafe", "unsafe"])
    assert not verify_series(KEY, SALT, sig, ops, doc, allow_unsigned=False).any()
    assert verify_series(KEY, SALT, sig, ops, doc, allow_unsigned=True).all()


def test_verify_series_mixed():
    ops = pd.Series(["resize:fit:4", "resize:fit:4"])
    doc = pd.Series(["1", "2"])
    good = sign_path(KEY, SALT, canonical_path("resize:fit:4", "1"))
    sig = pd.Series([good, good])  # second row: right sig, wrong doc
    out = verify_series(KEY, SALT, sig, ops, doc)
    assert out.tolist() == [True, False]
