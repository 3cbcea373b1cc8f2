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
from tokforge.operators.kernel import TransformError, apply_plan
from tokforge.plans.options import OptionParseError, Plan, parse_chain

TRANSFORM_RESULT_SCHEMA = StructType(
    [
        StructField("tokens_out", ArrayType(IntegerType()), True),
        StructField("n_out", IntegerType(), True),
        StructField("dtype", StringType(), True),
        StructField("size_bytes", LongType(), True),
        StructField("quality", IntegerType(), True),
        StructField("fmt", StringType(), True),
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
    n = len(tokens)
    out_tokens = np.empty(n, dtype=object)
    out_n = np.zeros(n, dtype=np.int32)
    out_dtype = np.empty(n, dtype=object)
    out_size = np.zeros(n, dtype=np.int64)
    out_quality = np.zeros(n, dtype=np.int32)
    out_fmt = np.empty(n, dtype=object)
    out_error = np.full(n, None, dtype=object)

    tok_vals = tokens.to_numpy(dtype=object)
    ops_vals = ops.to_numpy(dtype=object)
    ori_vals = orientation.to_numpy()
    dt_vals = src_dtype.to_numpy(dtype=object)
    ts_vals = ts_unix.to_numpy()

    for i in range(n):
        plan = _plan_for(ops_vals[i], config)
        if isinstance(plan, OptionParseError):
            out_error[i] = str(plan)
            continue

        # Expiry gate (reference: service.rs:645-660; event-time, never
        # wall-clock, so replay is deterministic).
        if plan.expires is not None and ts_vals[i] > plan.expires:
            out_error[i] = "Request expired"
            continue

        t = np.asarray(tok_vals[i], dtype=np.int64)

        # Security caps (reference: limits.rs:26-86, honored only when the
        # deployment allows per-request security options, service.rs:550-570).
        cap_bytes = config.max_src_file_size
        cap_res = config.max_src_resolution
        if config.allow_security_options:
            if plan.max_src_file_size is not None:
                cap_bytes = plan.max_src_file_size
            if plan.max_src_resolution is not None:
                cap_res = plan.max_src_resolution
        if cap_bytes is not None and len(t) * 4 > cap_bytes:
            out_error[i] = "Source image is too large"
            continue
        if cap_res is not None and len(t) > cap_res * 1_000_000:
            out_error[i] = "Source image resolution is too large"
            continue

        try:
            result = apply_plan(
                t,
                plan,
                orientation=int(ori_vals[i]),
                src_dtype=str(dt_vals[i]),
                default_format=config.default_format,
            )
        except (TransformError, OptionParseError) as exc:
            out_error[i] = str(exc)
            continue

        out_tokens[i] = result.tokens.astype(np.int32)
        out_n[i] = len(result.tokens)
        out_dtype[i] = result.dtype
        out_size[i] = result.size_bytes
        out_quality[i] = result.quality
        out_fmt[i] = result.fmt

    return pd.DataFrame(
        {
            "tokens_out": out_tokens,
            "n_out": out_n,
            "dtype": out_dtype,
            "size_bytes": out_size,
            "quality": out_quality,
            "fmt": out_fmt,
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
    df = requests
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
        F.col("result.error").alias("error"),
    )
