"""The processed-result cache as Spark state: imgforge's in-memory LRU
(reference: src/caching/cache.rs foyer store; probe service.rs:241-250,
insert :312-322) reborn as `applyInPandasWithState` with TTL eviction.

STATE COMPACTION (the 100 TB-critical shape): grouping by raw cache_key
means one Python invocation PER KEY — measured 208 us/row of pure
grouped-pandas overhead (~5k rows/s on 32 cores, while the stateless
transform path does 27M tokens/s).  Instead the key space is hashed into
`buckets` groups and each bucket's state holds a compact dict of entries
(parallel arrays), so one invocation serves ~rows/buckets requests and
the per-group overhead amortizes away — measured 6x end-to-end sustained
speedup at 720k keys (149.7s -> 24.8s for the full pipeline; the state
op itself ~40x).  Batching each bucket's MISS rows through the rect
kernel (instead of per-row apply_plan) bought a further 3.4x on the same
layout (24.8s -> 7.1s warmed, ~2.5M tokens served/s — BENCH.md).  Bucket
count bounds entry-list size; TTL evicts entries (processing-time, like
the LRU's expiry) and idle buckets drop whole via the group timeout.

Within a micro-batch, rows for a key are processed in event-time order:
the first computes (MISS) and inserts; every later row — same batch or a
later one while the TTL holds — serves the stored tokens (HIT) without
recomputing.
"""

from __future__ import annotations

import time
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
from tokforge.operators.alloc import tune_allocator  # noqa: F401 - worker mallopt
from tokforge.operators.kernel import TransformError
from tokforge.operators.kernel_rect import apply_plan_rect
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

# One bucket's compacted entry table: parallel arrays keyed by cache_key.
CACHE_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("dtypes", ArrayType(StringType())),
        StructField("toks", ArrayType(ArrayType(IntegerType()))),
        StructField("last_ms", ArrayType(LongType())),
    ]
)

DEFAULT_BUCKETS = 16384
# Scale-adaptive default: buckets per shuffle partition.  Each state task
# owns (buckets / shuffle_partitions) groups, so this bounds grouped-
# pandas invocations per task at a constant while total bucket count
# grows with the cluster (bigger clusters <-> bigger state).
BUCKETS_PER_PARTITION = 32


def resolve_buckets(buckets: "int | None", df: "DataFrame | None" = None) -> int:
    """Call-time bucket-count resolution (round-8: the old import-time
    default froze the dial at 16384).  The trade is per-invocation
    grouped-pandas overhead (measured ~0.25 ms/group on this box: 16384
    groups cost ~4.8 s of pure machinery on a 200k-row batch, and the
    full streaming pass dropped 5.99s -> 2.87s at 1024 buckets, rows
    identical) against per-bucket state-table size (every TOUCHED bucket
    (de)serializes its whole entry list, so sparse trickle batches over a
    huge state want MANY buckets, while availableNow/full-scan batches
    want few).  Resolution order: explicit argument > TOKFORGE_STATE_
    BUCKETS env > BUCKETS_PER_PARTITION x spark.sql.shuffle.partitions
    (scale-adaptive) > DEFAULT_BUCKETS.  Bucketing never changes row
    output — only which group serves a key — pinned by
    tests/test_streaming.py::test_cache_bucket_count_invariance."""
    import os

    if buckets is not None:
        return buckets
    env = os.environ.get("TOKFORGE_STATE_BUCKETS")
    if env:
        return int(env)
    if df is not None:
        try:
            n_part = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
            )
            return BUCKETS_PER_PARTITION * n_part
        except Exception:
            pass
    return DEFAULT_BUCKETS


def make_cache_state_func(
    config: EngineConfig = DEFAULT_CONFIG,
    ttl_ms: int = 0,
    capacity: int | None = None,
):
    """Build the stateful group function (key = hash bucket).  ttl_ms <= 0
    disables eviction; with TTL, entries expire `ttl_ms` after their last
    ACCESS (sliding, the LRU recency rule) and an idle bucket's whole
    state drops via the group timeout.

    ``capacity`` (default: config.cache_capacity_per_bucket; 0 =
    unbounded) is the per-bucket entry cap, the foyer hard-capacity
    analog (reference: caching/config.rs:54-66 memory 1000 / disk 10000;
    LRU eviction cache.rs:152-165): when a batch leaves a bucket over
    cap, lowest-recency entries are evicted first, so total state is
    bounded by buckets x capacity even under a hot-key storm where every
    distinct key recurs within one TTL window."""
    if capacity is None:
        capacity = config.cache_capacity_per_bucket

    def cache_fn(
        key: Tuple[int],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # no access for a full TTL: every entry inside is expired too
            state.remove()
            return

        chunks = list(pdf_iter)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        m = len(rows)
        doc_ids = rows["doc_id"].to_numpy(dtype=object)
        ts_vals = rows["ts"].to_numpy()
        cache_keys = rows["cache_key"].to_numpy(dtype=object)
        order = np.lexsort((doc_ids, ts_vals)) if m > 1 else np.arange(m)
        tokens_col = rows["tokens"].to_numpy(dtype=object)
        ops_col = rows["ops"].to_numpy(dtype=object)
        ori_col = rows["orientation"].to_numpy()
        sdt_col = rows["src_dtype"].to_numpy(dtype=object)

        # state -> dict {cache_key: [tokens_list, dtype, last_access_ms]}
        entries: dict = {}
        if state.exists:
            keys, dtypes_s, toks_s, last_s = state.get
            entries = {
                k: [t, d, lm]
                for k, d, t, lm in zip(keys, dtypes_s, toks_s, last_s)
            }
        now_ms = int(time.time() * 1000)
        if ttl_ms > 0 and entries:
            # entry-level TTL (processing time — the same clock
            # ProcessingTimeTimeout uses; never in the row-output path)
            entries = {
                k: v for k, v in entries.items() if now_ms - v[2] <= ttl_ms
            }

        statuses = np.empty(m, dtype=object)
        toks_out = np.empty(m, dtype=object)
        n_out = np.zeros(m, dtype=np.int32)
        dtypes = np.empty(m, dtype=object)
        errors = np.full(m, None, dtype=object)

        # Pass 1 — classify in event-time order, no kernel work: state HIT,
        # first-occurrence MISS (computes below), or duplicate of a MISS in
        # this same batch (serves the computed result, status HIT).
        first_of: dict = {}  # cache_key -> computing row index
        dup_of = np.full(m, -1, dtype=np.int64)
        for i in order:
            ent = entries.get(cache_keys[i])
            if ent is not None:
                statuses[i] = "HIT"
                toks_out[i] = ent[0]
                n_out[i] = len(ent[0])
                dtypes[i] = ent[1]
                ent[2] = now_ms  # access refreshes recency
                continue
            j = first_of.get(cache_keys[i])
            if j is None:
                first_of[cache_keys[i]] = i
            else:
                dup_of[i] = j

        # Pass 2 — MISS rows batched by (ops, n, src_dtype) through the
        # RECT kernel (the transform_arrow bucketing pattern): a cold cache
        # or miss storm pays vectorized cost, never per-row Python
        # (service.rs:312-322 compute-and-insert).
        inserted = False
        miss_groups: dict[tuple, list[int]] = {}
        for ck, i in first_of.items():
            miss_groups.setdefault(
                (ops_col[i], len(tokens_col[i]), sdt_col[i]), []
            ).append(i)
        for (ops_str, length, sdt), idx_list in miss_groups.items():
            idx = np.asarray(idx_list, dtype=np.int64)
            plan = _plan_for(ops_str, config)
            if isinstance(plan, OptionParseError):
                statuses[idx] = "ERROR"
                errors[idx] = str(plan)
                continue
            mat = (
                np.vstack([np.asarray(tokens_col[i], dtype=np.int64) for i in idx])
                if length > 0
                else np.empty((len(idx), 0), dtype=np.int64)
            )
            try:
                result = apply_plan_rect(
                    mat,
                    plan,
                    orientations=np.asarray(ori_col[idx], dtype=np.int64),
                    src_dtype=str(sdt),
                    default_format=config.default_format,
                )
            except (OptionParseError, TransformError) as exc:
                statuses[idx] = "ERROR"
                errors[idx] = str(exc)
                continue
            width = result.tokens.shape[1]
            for row_pos, i in enumerate(idx):
                cached = result.tokens[row_pos].tolist()
                entries[cache_keys[i]] = [cached, result.dtype, now_ms]
                statuses[i] = "MISS"
                toks_out[i] = cached
                n_out[i] = width
                dtypes[i] = result.dtype
            inserted = True

        # Pass 3 — duplicates serve their computing row's result (HIT, like
        # a state hit) or replay its error.
        for i in np.nonzero(dup_of >= 0)[0]:
            j = dup_of[i]
            if statuses[j] == "ERROR":
                statuses[i] = "ERROR"
                errors[i] = errors[j]
                continue
            statuses[i] = "HIT"
            toks_out[i] = toks_out[j]
            n_out[i] = n_out[j]
            dtypes[i] = dtypes[j]

        if capacity > 0 and len(entries) > capacity:
            # Capacity-bounded LRU: evict lowest last-access first until
            # the bucket is back at cap.  Entries touched in THIS
            # invocation (hits refreshed + fresh misses) share one clock
            # reading, so ties break by key — deterministic, and a row
            # just served is never preferred for eviction over a stale
            # one.  A miss storm larger than cap still answers every row
            # (the computed result is served either way); the overflow is
            # simply not retained — exactly foyer's admission-then-evict
            # behavior at capacity.
            victims = sorted(entries.items(), key=lambda kv: (kv[1][2], kv[0]))
            for k, _ in victims[: len(entries) - capacity]:
                del entries[k]

        if entries:
            # Pure-HIT skip (r8): with TTL and capacity both OFF, the only
            # thing an all-hits invocation changed is last-access
            # refreshes, which nothing can ever observe (no expiry, no
            # eviction) — so the bucket's full entry table need not be
            # re-serialized into the state store.  A sustained replay
            # where every key repeats (the bench's 6 event-time drops)
            # otherwise rewrites the ENTIRE state once per micro-batch.
            # With ttl_ms > 0 (recency drives expiry + the timeout re-arm)
            # or capacity > 0 (recency drives LRU eviction, which changes
            # future HIT/MISS output) the write stays unconditional.
            if inserted or ttl_ms > 0 or capacity > 0 or not state.exists:
                ks = list(entries.keys())
                state.update(
                    (
                        ks,
                        [entries[k][1] for k in ks],
                        [entries[k][0] for k in ks],
                        [entries[k][2] for k in ks],
                    )
                )
                if ttl_ms > 0:
                    # re-arm the bucket-idle timeout on EVERY invocation
                    # (Spark clears a pending timeout when the function
                    # runs)
                    state.setTimeoutDuration(ttl_ms)
        elif state.exists:
            state.remove()

        yield pd.DataFrame(
            {
                "cache_key": cache_keys,
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
    buckets: int | None = None,
    capacity: int | None = None,
) -> DataFrame:
    """Attach the stateful cache to a (streaming) request DataFrame.
    Shuffles once on the cache-key HASH BUCKET (state compaction — see
    module docstring); xxhash64 is deterministic, so replays land entries
    in the same buckets.  ``capacity`` (default config.cache_capacity_
    per_bucket) caps entries per bucket with LRU eviction, bounding total
    state at buckets x capacity."""
    buckets = resolve_buckets(buckets, requests)
    keyed = requests.withColumn("cache_key", cache_key_col(config)).withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col("cache_key")), F.lit(buckets))
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("_bucket").applyInPandasWithState(
        make_cache_state_func(config, ttl_ms, capacity),
        CACHE_OUTPUT_SCHEMA,
        CACHE_STATE_SCHEMA,
        "append",
        timeout,
    )
