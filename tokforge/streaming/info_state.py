"""The metadata (/info) cache as a SECOND keyed state namespace.

The reference keeps two cache namespaces in one store — processed results
and image-info probes (src/caching/cache.rs:240-256; the /info handler
probes-then-inserts in service.rs:347-408).  Here each namespace is its
own `applyInPandasWithState` operator with its own state schema: this one
is keyed by doc_id (info is per-source-document, independent of the ops
chain) and stores only the post-transform metadata — no token payload —
so state stays tiny and TTL-bounded.

The first request for a doc computes the info (MISS) and inserts; later
requests — same micro-batch or later ones while the TTL holds — serve the
stored row (HIT) without recomputing.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from tokforge.engine.config import DEFAULT_CONFIG, EngineConfig
from tokforge.engine.transform import _plan_for
from tokforge.operators.kernel import TransformError, apply_plan
from tokforge.plans.options import OptionParseError

INFO_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("info_status", StringType()),
        StructField("n_out", IntegerType()),
        StructField("dtype", StringType()),
        StructField("size_bytes", LongType()),
        StructField("error", StringType()),
    ]
)

INFO_STATE_SCHEMA = StructType(
    [
        StructField("n_out", IntegerType()),
        StructField("dtype", StringType()),
        StructField("size_bytes", LongType()),
        StructField("inserted_ms", LongType()),
    ]
)


def make_info_state_func(config: EngineConfig = DEFAULT_CONFIG, ttl_ms: int = 0):
    """Stateful group function for the info namespace.  ttl_ms <= 0
    disables eviction (mirrors cache_state.make_cache_state_func)."""

    def info_fn(
        key: Tuple[str],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.hasTimedOut:
            state.remove()
            return

        chunks = list(pdf_iter)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        m = len(rows)
        ts_vals = rows["ts"].to_numpy()
        order = np.argsort(ts_vals, kind="stable") if m > 1 else np.arange(m)
        tokens_col = rows["tokens"].to_numpy(dtype=object)
        ops_col = rows["ops"].to_numpy(dtype=object)
        ori_col = rows["orientation"].to_numpy()
        sdt_col = rows["src_dtype"].to_numpy(dtype=object)

        cached = state.get if state.exists else None  # (n_out, dtype, size, ms)

        statuses = np.empty(m, dtype=object)
        n_out = np.zeros(m, dtype=np.int32)
        dtypes = np.empty(m, dtype=object)
        sizes = np.zeros(m, dtype=np.int64)
        errors = np.full(m, None, dtype=object)

        for i in order:
            if cached is not None:
                statuses[i] = "HIT"
                n_out[i], dtypes[i], sizes[i] = cached[0], cached[1], cached[2]
                continue
            try:
                plan = _plan_for(ops_col[i], config)
                if isinstance(plan, OptionParseError):
                    raise plan
                result = apply_plan(
                    np.asarray(tokens_col[i], dtype=np.int64),
                    plan,
                    orientation=int(ori_col[i]),
                    src_dtype=str(sdt_col[i]),
                    default_format=config.default_format,
                )
            except (OptionParseError, TransformError) as exc:
                statuses[i] = "ERROR"
                errors[i] = str(exc)
                continue
            cached = (int(result.tokens.shape[0]), result.dtype, int(result.size_bytes), 0)
            state.update(cached)
            statuses[i] = "MISS"
            n_out[i], dtypes[i], sizes[i] = cached[0], cached[1], cached[2]

        # re-arm on every invocation (sliding TTL): Spark clears the pending
        # timeout when the function runs for a key, so a HIT would otherwise
        # disarm eviction permanently (see cache_state.py)
        if ttl_ms > 0 and state.exists:
            state.setTimeoutDuration(ttl_ms)

        yield pd.DataFrame(
            {
                "doc_id": np.full(m, doc_id, dtype=object),
                "ts": ts_vals,
                "info_status": statuses,
                "n_out": n_out,
                "dtype": dtypes,
                "size_bytes": sizes,
                "error": errors,
            }
        )

    return info_fn


def with_info_state(
    requests: DataFrame,
    config: EngineConfig = DEFAULT_CONFIG,
    ttl_ms: int = 0,
) -> DataFrame:
    """Attach the info-cache state to a (streaming) request DataFrame.
    Shuffles once on doc_id — a DIFFERENT key than the result cache's
    cache_key, which is what makes it a genuine second namespace."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return requests.groupBy("doc_id").applyInPandasWithState(
        make_info_state_func(config, ttl_ms),
        INFO_OUTPUT_SCHEMA,
        INFO_STATE_SCHEMA,
        "append",
        timeout,
    )
