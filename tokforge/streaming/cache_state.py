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
from tokforge.engine.transform import cache_key_col
from tokforge.operators.kernel import TransformError, apply_plan
from tokforge.plans.options import OptionParseError, parse_chain

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

        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values(["ts", "doc_id"], kind="mergesort")

        cached_tokens = None
        cached_dtype = None
        if state.exists:
            cached_tokens, cached_dtype, _inserted = state.get

        out = {c: [] for c in ("doc_id", "ts", "cache_status", "tokens_out", "n_out", "dtype", "error")}
        for _, r in rows.iterrows():
            if cached_tokens is not None:
                out["doc_id"].append(r["doc_id"])
                out["ts"].append(r["ts"])
                out["cache_status"].append("HIT")
                out["tokens_out"].append(cached_tokens)
                out["n_out"].append(len(cached_tokens))
                out["dtype"].append(cached_dtype)
                out["error"].append(None)
                continue
            # MISS: compute once, insert into state (service.rs:312-322).
            try:
                plan = parse_chain(
                    r["ops"], config.presets_dict or None, config.only_presets
                )
                result = apply_plan(
                    np.asarray(r["tokens"], dtype=np.int64),
                    plan,
                    orientation=int(r["orientation"]),
                    src_dtype=str(r["src_dtype"]),
                    default_format=config.default_format,
                )
            except (OptionParseError, TransformError) as exc:
                out["doc_id"].append(r["doc_id"])
                out["ts"].append(r["ts"])
                out["cache_status"].append("ERROR")
                out["tokens_out"].append(None)
                out["n_out"].append(0)
                out["dtype"].append(None)
                out["error"].append(str(exc))
                continue
            cached_tokens = [int(x) for x in result.tokens]
            cached_dtype = result.dtype
            state.update((cached_tokens, cached_dtype, 0))
            if ttl_ms > 0:
                state.setTimeoutDuration(ttl_ms)
            out["doc_id"].append(r["doc_id"])
            out["ts"].append(r["ts"])
            out["cache_status"].append("MISS")
            out["tokens_out"].append(cached_tokens)
            out["n_out"].append(len(cached_tokens))
            out["dtype"].append(cached_dtype)
            out["error"].append(None)

        result_df = pd.DataFrame(out)
        result_df.insert(0, "cache_key", cache_key)
        yield result_df

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
