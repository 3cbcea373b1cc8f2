"""HMAC-SHA256 request signing (reference: src/url.rs:60-72
validate_signature; src/service.rs:448-477 signature gate + path-to-sign).

The signed path is ``"/" + ops_chain + "/" + doc_id`` — the token-domain
canonical form of the imgforge URL path (options + source).  Signatures are
URL-safe base64 without padding, over ``HMAC(key, salt || path)``.
"""

from __future__ import annotations

import base64
import hashlib
import hmac

import numpy as np
import pandas as pd


def canonical_path(ops: str, doc_id: str) -> str:
    return f"/{ops}/{doc_id}"


def sign_path(key: bytes, salt: bytes, path: str) -> str:
    mac = hmac.new(key, salt + path.encode("utf-8"), hashlib.sha256)
    return base64.urlsafe_b64encode(mac.digest()).decode("ascii").rstrip("=")


def validate_signature(key: bytes, salt: bytes, signature: str, path: str) -> bool:
    """Constant-time comparison against the expected digest
    (reference: url.rs:60-72 mac.verify_slice)."""
    pad = "=" * (-len(signature) % 4)
    try:
        decoded = base64.urlsafe_b64decode(signature + pad)
    except Exception:  # noqa: BLE001 - malformed base64 is just invalid
        return False
    mac = hmac.new(key, salt + path.encode("utf-8"), hashlib.sha256)
    return hmac.compare_digest(mac.digest(), decoded)


def sign_series(key: bytes, salt: bytes, ops: pd.Series, doc_id: pd.Series) -> pd.Series:
    """Vectorized (per-Arrow-batch) signing for pandas UDFs."""
    out = np.empty(len(ops), dtype=object)
    ops_vals = ops.to_numpy(dtype=object)
    doc_vals = doc_id.to_numpy(dtype=object)
    for i in range(len(out)):
        out[i] = sign_path(key, salt, canonical_path(ops_vals[i], doc_vals[i]))
    return pd.Series(out)


def sign_path_series(key: bytes, salt: bytes, path: pd.Series) -> pd.Series:
    """Sign ARBITRARY path strings (the full-envelope flow: the message is
    build_path_to_sign's output, service.rs:475-477)."""
    vals = path.to_numpy(dtype=object)
    out = np.empty(len(vals), dtype=object)
    for i in range(len(out)):
        out[i] = sign_path(key, salt, vals[i])
    return pd.Series(out)


def validate_path_series(
    key: bytes, salt: bytes, sig: pd.Series, path: pd.Series
) -> pd.Series:
    """Verify signatures over arbitrary path strings (url.rs:60-72)."""
    sig_vals = sig.to_numpy(dtype=object)
    path_vals = path.to_numpy(dtype=object)
    out = np.empty(len(sig_vals), dtype=bool)
    for i in range(len(out)):
        s, pth = sig_vals[i], path_vals[i]
        # Spark evaluates extracted python UDFs unconditionally even when
        # they sit inside a CASE branch — nulls must not crash the batch
        if s is None or pth is None:
            out[i] = False
            continue
        out[i] = validate_signature(key, salt, s, pth)
    return pd.Series(out)


def verify_series(
    key: bytes,
    salt: bytes,
    sig: pd.Series,
    ops: pd.Series,
    doc_id: pd.Series,
    allow_unsigned: bool = False,
) -> pd.Series:
    """Vectorized verification; `unsafe` literal passes only when the
    deployment allows unsigned requests (reference: service.rs:453-470)."""
    out = np.empty(len(sig), dtype=bool)
    sig_vals = sig.to_numpy(dtype=object)
    ops_vals = ops.to_numpy(dtype=object)
    doc_vals = doc_id.to_numpy(dtype=object)
    for i in range(len(out)):
        s = sig_vals[i]
        if s == "unsafe":
            out[i] = allow_unsigned
        else:
            out[i] = validate_signature(
                key, salt, s, canonical_path(ops_vals[i], doc_vals[i])
            )
    return pd.Series(out)
