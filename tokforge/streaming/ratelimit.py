"""Streaming token-bucket rate limiter as keyed state.

The reference admits requests through a per-client token bucket
(src/middleware.rs:38-51; configured in app.rs:136-156) and answers 429
when the bucket is empty.  Here the bucket is Spark state keyed by
`source`: capacity C, refill R tokens/sec of EVENT time (never wall
clock, so replays are byte-identical), one token per request.

This is the stateful complement of the batch `ratelimit_admission` query
(engine/queries.py), which models the same 429 surface as a deterministic
per-window quota; the streaming version carries the bucket ACROSS windows
exactly like the reference's leaky bucket.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RATELIMIT_OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("doc_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("admitted", BooleanType()),
        StructField("tokens_after", DoubleType()),
    ]
)

RATELIMIT_STATE_SCHEMA = StructType(
    [
        StructField("tokens", DoubleType()),
        StructField("last_ns", LongType()),
    ]
)


def make_ratelimit_func(capacity: float = 5.0, refill_per_sec: float = 1.0):
    """Build the stateful group function.  Rows are processed in event-time
    order (doc_id tiebreak); the bucket refills `refill_per_sec * elapsed`
    capped at `capacity`, each admitted row consumes 1 token."""

    def rl_fn(
        key: Tuple[str],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        source = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        chunks = list(pdf_iter)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        m = len(rows)
        ts_vals = rows["ts"].to_numpy()
        doc_ids = rows["doc_id"].to_numpy(dtype=object)
        order = np.lexsort((doc_ids, ts_vals)) if m > 1 else np.arange(m)
        ts_ns = rows["ts"].astype("int64").to_numpy()  # event time in ns

        if state.exists:
            tokens, last_ns = state.get
        else:
            tokens, last_ns = float(capacity), None

        admitted = np.zeros(m, dtype=bool)
        after = np.zeros(m, dtype=np.float64)
        for i in order:
            now_ns = int(ts_ns[i])
            if last_ns is not None and now_ns > last_ns:
                tokens = min(
                    float(capacity),
                    tokens + (now_ns - last_ns) / 1_000_000_000.0 * refill_per_sec,
                )
            last_ns = now_ns if last_ns is None else max(last_ns, now_ns)
            if tokens >= 1.0:
                tokens -= 1.0
                admitted[i] = True
            after[i] = tokens
        state.update((tokens, last_ns))

        yield pd.DataFrame(
            {
                "source": np.full(m, source, dtype=object),
                "doc_id": doc_ids,
                "ts": rows["ts"].to_numpy(),
                "admitted": admitted,
                "tokens_after": after,
            }
        )

    return rl_fn


def with_rate_limit(
    requests: DataFrame,
    capacity: float = 5.0,
    refill_per_sec: float = 1.0,
) -> DataFrame:
    """Attach the token-bucket state to a (streaming) request DataFrame.
    Shuffles once on `source` — the rate-limit key.  The fixture stream is
    skewed by source (~70% one origin); that is fine HERE because the
    bucket itself serializes per source by definition — the state op does
    O(rows) trivial work, unlike the transform path, which spreads via
    salted repartition (engine/skew.py) BEFORE heavy compute."""
    return requests.groupBy("source").applyInPandasWithState(
        make_ratelimit_func(capacity, refill_per_sec),
        RATELIMIT_OUTPUT_SCHEMA,
        RATELIMIT_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
