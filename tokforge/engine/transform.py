"""The Spark execution of the transform chain: ONE Arrow-vectorized pandas
UDF applies parse -> validate -> kernel for a whole record batch (no
per-row Python crossing the JVM boundary; SURVEY.md §1.2 model mapping).

Plan parsing is memoized per distinct ops string (chains repeat massively
in a real request stream — the reference memoizes the same way via its
processed-image cache, service.rs:241-250), so per-batch Python cost is
dominated by the numpy kernel, not the parser.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from tokforge.engine.config import DEFAULT_CONFIG, EngineConfig
from tokforge.functions.signing import sign_series, verify_series
from tokforge.operators.kernel import TransformError
from tokforge.plans.options import (
    OptionParseError,
    Plan,
    content_disposition,
    parse_chain,
    strips_metadata,
)

TRANSFORM_RESULT_SCHEMA = StructType(
    [
        StructField("tokens_out", ArrayType(IntegerType()), True),
        StructField("n_out", IntegerType(), True),
        StructField("dtype", StringType(), True),
        StructField("size_bytes", LongType(), True),
        StructField("quality", IntegerType(), True),
        StructField("fmt", StringType(), True),
        # Content-Disposition header value (service.rs:662-674); null
        # without a filename option or on error rows
        StructField("content_disposition", StringType(), True),
        # EXIF-orientation metadata carried INTO the output: the original
        # tag when kept (raw / auto_rotate:false), 1 once auto-rotate has
        # consumed it, null when strip_metadata/strip_color_profile drops
        # metadata on encode (save.rs:66-72) or on error rows
        StructField("meta_orientation", IntegerType(), True),
        StructField("error", StringType(), True),
    ]
)

# Module-level plan cache: lives per executor Python worker, shared across
# batches (the parse analog of the reference's OnceCell'd watermark/format
# probes, service.rs:588-603 / save.rs:209-219).
_PLAN_CACHE: dict[tuple, "Plan | OptionParseError"] = {}


def _plan_for(ops: str, config: EngineConfig):
    key = (ops, config.presets, config.only_presets)
    hit = _PLAN_CACHE.get(key)
    if hit is None:
        try:
            hit = parse_chain(ops, config.presets_dict or None, config.only_presets)
        except OptionParseError as exc:
            hit = exc
        if len(_PLAN_CACHE) > 4096:
            _PLAN_CACHE.clear()
        _PLAN_CACHE[key] = hit
    return hit


def _transform_batch(
    tokens: pd.Series,
    ops: pd.Series,
    orientation: pd.Series,
    src_dtype: pd.Series,
    ts_unix: pd.Series,
    config: EngineConfig,
) -> pd.DataFrame:
    """Length-bucketed vectorized execution: rows are grouped by
    (ops, n_tok, src_dtype) and each bucket runs through the rectangular
    kernel as one (m, n) matrix — the whole chain is numpy axis ops with
    zero per-row Python (SURVEY.md §4: the libvips fused-pipeline analog).
    """
    from tokforge.operators.kernel_rect import apply_plan_rect

    n = len(tokens)
    out_tokens = np.empty(n, dtype=object)
    out_n = np.zeros(n, dtype=np.int32)
    out_dtype = np.empty(n, dtype=object)
    out_size = np.zeros(n, dtype=np.int64)
    out_quality = np.zeros(n, dtype=np.int32)
    out_fmt = np.empty(n, dtype=object)
    out_cd = np.full(n, None, dtype=object)
    out_meta = np.full(n, None, dtype=object)
    out_error = np.full(n, None, dtype=object)

    tok_vals = tokens.to_numpy(dtype=object)
    ops_vals = ops.to_numpy(dtype=object)
    ori_vals = np.asarray(orientation.to_numpy(), dtype=np.int64)
    dt_vals = src_dtype.to_numpy(dtype=object)
    ts_vals = np.asarray(ts_unix.to_numpy(), dtype=np.int64)
    lengths = np.fromiter((len(t) for t in tok_vals), dtype=np.int64, count=n)

    # bucket rows by (ops, length, src_dtype)
    buckets: dict[tuple, list[int]] = {}
    for i in range(n):
        buckets.setdefault((ops_vals[i], lengths[i], dt_vals[i]), []).append(i)

    for (ops_str, length, sdt), idx_list in buckets.items():
        idx = np.asarray(idx_list, dtype=np.int64)
        plan = _plan_for(ops_str, config)
        if isinstance(plan, OptionParseError):
            out_error[idx] = str(plan)
            continue

        # MIME-allowlist analog (reference: service.rs:500-510).
        if (
            config.allowed_src_dtypes is not None
            and str(sdt).lower() not in config.allowed_src_dtypes
        ):
            out_error[idx] = "Source type not allowed"
            continue

        # Expiry gate (reference: service.rs:645-660; event-time, never
        # wall-clock, so replay is deterministic).
        if plan.expires is not None:
            expired = ts_vals[idx] > plan.expires
            out_error[idx[expired]] = "Request expired"
            idx = idx[~expired]
            if len(idx) == 0:
                continue

        # Security caps (reference: limits.rs:26-86, honored only when the
        # deployment allows per-request security options, service.rs:550-570).
        cap_bytes = config.max_src_file_size
        cap_res = config.max_src_resolution
        if config.allow_security_options:
            if plan.max_src_file_size is not None:
                cap_bytes = plan.max_src_file_size
            if plan.max_src_resolution is not None:
                cap_res = plan.max_src_resolution
        if cap_bytes is not None and length * 4 > cap_bytes:
            out_error[idx] = "Source image is too large"
            continue
        if cap_res is not None and length > cap_res * 1_000_000:
            out_error[idx] = "Source image resolution is too large"
            continue

        mat = (
            np.vstack([np.asarray(tok_vals[i], dtype=np.int64) for i in idx])
            if length > 0
            else np.empty((len(idx), 0), dtype=np.int64)
        )
        try:
            result = apply_plan_rect(
                mat,
                plan,
                orientations=ori_vals[idx],
                src_dtype=str(sdt),
                default_format=config.default_format,
            )
        except (TransformError, OptionParseError) as exc:
            out_error[idx] = str(exc)
            continue

        mat32 = result.tokens.astype(np.int32)
        for row_pos, i in enumerate(idx):
            out_tokens[i] = mat32[row_pos]
        out_n[idx] = result.tokens.shape[1]
        out_dtype[idx] = result.dtype
        out_size[idx] = result.size_bytes
        out_quality[idx] = result.quality
        out_fmt[idx] = result.fmt
        out_cd[idx] = content_disposition(plan)
        if not strips_metadata(plan):
            if plan.auto_rotate and not plan.raw:
                out_meta[idx] = 1  # EXIF consumed by auto-rotate
            else:
                out_meta[idx] = ori_vals[idx]

    return pd.DataFrame(
        {
            "tokens_out": out_tokens,
            "n_out": out_n,
            "dtype": out_dtype,
            "size_bytes": out_size,
            "quality": out_quality,
            "fmt": out_fmt,
            "content_disposition": out_cd,
            "meta_orientation": out_meta,
            "error": out_error,
        }
    )


def make_transform_udf(config: EngineConfig = DEFAULT_CONFIG):
    @F.pandas_udf(TRANSFORM_RESULT_SCHEMA)
    def transform_udf(
        tokens: pd.Series,
        ops: pd.Series,
        orientation: pd.Series,
        src_dtype: pd.Series,
        ts_unix: pd.Series,
    ) -> pd.DataFrame:
        return _transform_batch(tokens, ops, orientation, src_dtype, ts_unix, config)

    return transform_udf


def make_verify_udf(config: EngineConfig = DEFAULT_CONFIG):
    @F.pandas_udf(BooleanType())
    def verify_udf(sig: pd.Series, ops: pd.Series, doc_id: pd.Series) -> pd.Series:
        return verify_series(
            config.key, config.salt, sig, ops, doc_id, config.allow_unsigned
        )

    return verify_udf


def make_sign_udf(config: EngineConfig = DEFAULT_CONFIG):
    @F.pandas_udf(StringType())
    def sign_udf(ops: pd.Series, doc_id: pd.Series) -> pd.Series:
        return sign_series(config.key, config.salt, ops, doc_id)

    return sign_udf


# Reference status taxonomy (service.rs:676-800 tests): FORBIDDEN for
# signature/bearer failures (:438-468), NOT_FOUND for expiry (:656),
# BAD_REQUEST for parse / limits / MIME / processing errors (:450-547),
# OK otherwise.  One int column so the dead-letter channel can partition
# by class and ops dashboards can count per-status.
STATUS_OK = 200
STATUS_BAD_REQUEST = 400
STATUS_FORBIDDEN = 403
STATUS_NOT_FOUND = 404


def status_for_error(error: "str | None", sig_valid: bool = True) -> int:
    """Scalar reference for :func:`status_code_col` (tests assert parity)."""
    if not sig_valid:
        return STATUS_FORBIDDEN
    if error is None:
        return STATUS_OK
    if error == "Request expired":
        return STATUS_NOT_FOUND
    return STATUS_BAD_REQUEST


def status_code_col(
    sig_valid: str = "sig_valid", error: str = "error"
) -> Column:
    """Pure-JVM status-class column over the transform output (stays in
    whole-stage codegen — no Python in the taxonomy path)."""
    return (
        F.when(~F.col(sig_valid), F.lit(STATUS_FORBIDDEN))
        .when(F.col(error).isNull(), F.lit(STATUS_OK))
        .when(F.col(error) == "Request expired", F.lit(STATUS_NOT_FOUND))
        .otherwise(F.lit(STATUS_BAD_REQUEST))
        .cast("int")
    )


def admit_bearer(df: DataFrame, config: EngineConfig) -> DataFrame:
    """Bearer-secret admission gate (reference: service.rs:432-446): a
    constant-token filter evaluated JVM-side before any Python work.
    Shared by BOTH execution paths — the pandas and Arrow transforms must
    stay row-identical (docs/SEMANTICS.md invariant)."""
    if config.bearer_token is not None and "bearer" in df.columns:
        return df.filter(F.col("bearer").eqNullSafe(F.lit(config.bearer_token)))
    return df


def cache_key_col(config: EngineConfig = DEFAULT_CONFIG) -> Column:
    """Cache key = ops chain + doc id, prefixed with the default format when
    the chain names none (reference: service.rs:151-162 cache_key_for_path).
    Expects `ops` and `doc_id` columns in scope; pure built-in expressions
    (stays in whole-stage codegen)."""
    path = F.concat(F.lit("/"), F.col("ops"), F.lit("/"), F.col("doc_id"))
    has_format = F.col("ops").rlike("(^|/)(format|f|ext):")
    default_fmt = F.lit(config.default_format or "src")
    return F.when(has_format, path).otherwise(
        F.concat(default_fmt, F.lit(":"), path)
    )


def transform_requests(
    requests: DataFrame,
    config: EngineConfig = DEFAULT_CONFIG,
    verify: bool = True,
) -> DataFrame:
    """The full per-row pipeline over a request DataFrame:
    signature gate -> parse/validate -> vectorized kernel -> output columns.

    Spark shape (SURVEY.md §3 entry point 1): everything before/after the
    single pandas UDF is built-in Column algebra, so Catalyst keeps scan
    pruning and whole-stage codegen around the one Arrow exchange.
    """
    transform_udf = make_transform_udf(config)
    df = admit_bearer(requests, config)
    if verify:
        verify_udf = make_verify_udf(config)
        df = df.withColumn(
            "sig_valid", verify_udf(F.col("sig"), F.col("ops"), F.col("doc_id"))
        )
    else:
        df = df.withColumn("sig_valid", F.lit(True))

    result = transform_udf(
        F.col("tokens"),
        F.col("ops"),
        F.col("orientation"),
        F.col("src_dtype"),
        F.unix_timestamp(F.col("ts")),
    )
    df = df.withColumn("result", result)
    return df.select(
        "doc_id",
        "source",
        "ts",
        "ops",
        "n_tok",
        "sig_valid",
        F.col("result.tokens_out").alias("tokens_out"),
        F.col("result.n_out").alias("n_out"),
        F.col("result.dtype").alias("dtype"),
        F.col("result.size_bytes").alias("size_bytes"),
        F.col("result.quality").alias("quality"),
        F.col("result.fmt").alias("fmt"),
        F.col("result.content_disposition").alias("content_disposition"),
        F.col("result.meta_orientation").alias("meta_orientation"),
        F.col("result.error").alias("error"),
    ).withColumn("status", status_code_col())
