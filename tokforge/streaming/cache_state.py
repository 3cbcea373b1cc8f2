"""The processed-result cache as Spark state: imgforge's in-memory LRU
(reference: src/caching/cache.rs foyer store; probe service.rs:241-250,
insert :312-322) reborn as `applyInPandasWithState` keyed by cache-key
with TTL eviction (`GroupStateTimeout.ProcessingTimeTimeout` — the LRU
capacity bound becomes a time bound, the idiomatic Spark eviction).

Within a micro-batch, rows for a key are processed in event-time order:
the first computes (MISS) and inserts; every later row — same batch or a
later one while the TTL holds — serves the stored tokens (HIT) without
recomputing.  State values stay small (tokens + dtype) per the state-store
sizing guidance in SURVEY.md §7.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from tokforge.engine.config import DEFAULT_CONFIG, EngineConfig
from tokforge.engine.transform import _plan_for, cache_key_col
from tokforge.operators.kernel import TransformError, apply_plan
from tokforge.plans.options import OptionParseError

CACHE_OUTPUT_SCHEMA = StructType(
    [
        StructField("cache_key", StringType()),
        StructField("doc_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("cache_status", StringType()),
        StructField("tokens_out", ArrayType(IntegerType())),
        StructField("n_out", IntegerType()),
        StructField("dtype", StringType()),
        StructField("error", StringType()),
    ]
)

CACHE_STATE_SCHEMA = StructType(
    [
        StructField("tokens", ArrayType(IntegerType())),
        StructField("dtype", StringType()),
        StructField("inserted_ms", LongType()),
    ]
)


def make_cache_state_func(config: EngineConfig = DEFAULT_CONFIG, ttl_ms: int = 0):
    """Build the stateful group function.  ttl_ms <= 0 disables eviction."""

    def cache_fn(
        key: Tuple[str],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cache_key = key[0]
        if state.hasTimedOut:
            # TTL eviction (the LRU expiry analog): drop state, emit nothing.
            state.remove()
            return

        chunks = list(pdf_iter)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        m = len(rows)
        # event-time order decides who computes (groups are usually 1-3
        # rows, so plain argsort on raw columns beats DataFrame.sort_values)
        doc_ids = rows["doc_id"].to_numpy(dtype=object)
        ts_vals = rows["ts"].to_numpy()
        if m > 1:
            order = np.lexsort((doc_ids, ts_vals))
        else:
            order = np.arange(1)
        tokens_col = rows["tokens"].to_numpy(dtype=object)
        ops_col = rows["ops"].to_numpy(dtype=object)
        ori_col = rows["orientation"].to_numpy()
        sdt_col = rows["src_dtype"].to_numpy(dtype=object)

        cached_tokens = None
        cached_dtype = None
        if state.exists:
            cached_tokens, cached_dtype, _inserted = state.get

        statuses = np.empty(m, dtype=object)
        toks_out = np.empty(m, dtype=object)
        n_out = np.zeros(m, dtype=np.int32)
        dtypes = np.empty(m, dtype=object)
        errors = np.full(m, None, dtype=object)

        for i in order:
            if cached_tokens is not None:
                statuses[i] = "HIT"
                toks_out[i] = cached_tokens
                n_out[i] = len(cached_tokens)
                dtypes[i] = cached_dtype
                continue
            # MISS: compute once, insert into state (service.rs:312-322).
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
            cached_tokens = result.tokens.astype(np.int32)
            cached_dtype = result.dtype
            state.update(([int(x) for x in cached_tokens], cached_dtype, 0))
            statuses[i] = "MISS"
            toks_out[i] = cached_tokens
            n_out[i] = len(cached_tokens)
            dtypes[i] = cached_dtype

        # (Re-)arm the TTL on EVERY invocation that leaves state behind:
        # Spark clears a group's pending timeout whenever the function runs
        # for that key, so arming only on MISS would let any HIT disarm
        # eviction permanently.  Re-arming = sliding TTL, i.e. access
        # refreshes recency — exactly the reference LRU's behavior.
        if ttl_ms > 0 and state.exists:
            state.setTimeoutDuration(ttl_ms)

        yield pd.DataFrame(
            {
                "cache_key": np.full(m, cache_key, dtype=object),
                "doc_id": doc_ids,
                "ts": ts_vals,
                "cache_status": statuses,
                "tokens_out": toks_out,
                "n_out": n_out,
                "dtype": dtypes,
                "error": errors,
            }
        )

    return cache_fn


def with_cache_state(
    requests: DataFrame,
    config: EngineConfig = DEFAULT_CONFIG,
    ttl_ms: int = 0,
) -> DataFrame:
    """Attach the stateful cache to a (streaming) request DataFrame.
    Shuffles once on cache_key (the state-store partitioning)."""
    keyed = requests.withColumn("cache_key", cache_key_col(config))
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("cache_key").applyInPandasWithState(
        make_cache_state_func(config, ttl_ms),
        CACHE_OUTPUT_SCHEMA,
        CACHE_STATE_SCHEMA,
        "append",
        timeout,
    )
