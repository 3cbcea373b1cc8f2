"""Randomized three-way check of the CEP operators: the Spark batch face
(tokforge/streaming/patterns.py) == a brute-force pure-Python reference
== the DuckDB mirror, over seeded random event streams with TIMESTAMP
TIES (the (ts, id) tiebreak is where window implementations diverge).

All scenarios of one pattern run in ONE Spark pass: the scenario id is
folded into the key, so per-key semantics isolate scenarios for free.
Example count scales with TOKFORGE_FUZZ_EXAMPLES (default 60 scenarios
per pattern arm — small alphabet + dense ties makes collisions common).
Comparisons use integer epoch seconds throughout (naive-datetime
`.timestamp()` is tz-dependent).
"""

from __future__ import annotations

import os
import random

import duckdb
import pandas as pd
import pyspark.sql.functions as F

from tokforge.streaming.patterns import (
    WILDCARD,
    detect_absence_batch,
    detect_pattern_batch,
    sql_detect_absence,
    sql_detect_pattern,
)

N_SCEN = max(10, int(os.environ.get("TOKFORGE_FUZZ_EXAMPLES", "60")))
ALPHABET = ["A", "B", "C"]


def _scenarios(seed: int):
    """Seeded random rows: few keys, tiny ts range (ties guaranteed),
    shuffled ids (id order != ts order)."""
    rng = random.Random(seed)
    rows = []
    for sid in range(N_SCEN):
        n = rng.randint(0, 14)
        ids = [f"d{j:03d}" for j in range(n)]
        rng.shuffle(ids)
        for j in range(n):
            rows.append(
                (
                    f"s{sid:03d}|k{rng.randint(0, 2)}",
                    ids[j],
                    rng.choice(ALPHABET),
                    1_700_000_000 + rng.randint(0, 8) * 10,  # dense ties
                )
            )
    return rows


def _ordered(rows):
    by_key: dict[str, list] = {}
    for k, d, e, t in rows:
        by_key.setdefault(k, []).append((t, d, e))
    for evs in by_key.values():
        evs.sort()  # (ts, id) total order
    return by_key


def _ref_pattern(rows, pattern, within_s):
    out = set()
    L = len(pattern)
    for k, evs in _ordered(rows).items():
        for i in range(len(evs) - L + 1):
            win = evs[i : i + L]
            if win[-1][0] - win[0][0] > within_s:
                continue
            if all(p == WILDCARD or win[j][2] == p for j, p in enumerate(pattern)):
                out.add((k, win[0][0], win[-1][0], win[0][1], win[-1][1]))
    return out


def _ref_absence(rows, a, b, within_s):
    out = set()
    for k, evs in _ordered(rows).items():
        for i, (t, d, e) in enumerate(evs):
            if e != a:
                continue
            closed = any(
                eb == b and tb <= t + within_s for tb, _db, eb in evs[i + 1 :]
            )
            if not closed:
                out.add((k, d, t, t + within_s))
    return out


def _spark_events(spark, rows):
    return spark.createDataFrame(
        rows, "source string, doc_id string, event string, ts_s long"
    ).select("source", "doc_id", "event", F.timestamp_seconds("ts_s").alias("ts"))


def _duck(rows):
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "event", "ts_s"])
    pdf["ts"] = pd.to_datetime(pdf["ts_s"], unit="s")
    con.register("events", pdf[["source", "doc_id", "event", "ts"]])
    return con


def test_pattern_fuzz_three_way(spark):
    arms = [
        (["A"], 0),
        (["A", "B"], 10),
        (["B", "*", "B"], 20),
        (["A", "A", "C"], 40),
        (["*", "*"], 0),  # ties-only horizon: same-ts pairs only
    ]
    for seed, (pattern, within_s) in enumerate(arms):
        rows = _scenarios(1000 + seed)
        got = {
            tuple(r)
            for r in detect_pattern_batch(
                _spark_events(spark, rows), pattern, within_s
            )
            .select(
                "key",
                F.unix_timestamp("start_ts").alias("t0"),
                F.unix_timestamp("end_ts").alias("t1"),
                "first_id",
                "last_id",
            )
            .collect()
        }
        want = _ref_pattern(rows, pattern, within_s)
        assert got == want, (pattern, within_s)

        duck = {
            tuple(r)
            for r in _duck(rows)
            .execute(
                "SELECT key, CAST(epoch(start_ts) AS BIGINT),"
                " CAST(epoch(end_ts) AS BIGINT), first_id, last_id FROM ("
                + sql_detect_pattern(pattern, within_s, "events")
                + ")"
            )
            .fetchall()
        }
        assert duck == want, (pattern, within_s)
        assert want, (pattern, within_s)  # every arm must exercise matches


def test_absence_fuzz_three_way(spark):
    arms = [("A", "B", 10), ("C", "A", 0), ("B", "C", 40)]
    for seed, (a, b, within_s) in enumerate(arms):
        rows = _scenarios(2000 + seed)
        got = {
            tuple(r)
            for r in detect_absence_batch(
                _spark_events(spark, rows), a, b, within_s
            )
            .select(
                "key",
                "doc_id",
                F.unix_timestamp("start_ts").alias("t0"),
                F.unix_timestamp("deadline_ts").alias("t1"),
            )
            .collect()
        }
        want = {
            (k, d, t0, t1) for (k, d, t0, t1) in _ref_absence(rows, a, b, within_s)
        }
        assert got == want, (a, b, within_s)

        duck = {
            tuple(r)
            for r in _duck(rows)
            .execute(
                "SELECT key, doc_id, CAST(epoch(start_ts) AS BIGINT),"
                " CAST(epoch(deadline_ts) AS BIGINT) FROM ("
                + sql_detect_absence(a, b, within_s, "events")
                + ")"
            )
            .fetchall()
        }
        assert duck == want, (a, b, within_s)
        assert want, (a, b, within_s)
