"""CEP sequence-pattern detection (tokforge/streaming/patterns.py): the
batch face equals its DuckDB lead()-window mirror; the streaming face —
event-time reorder buffer + EventTimeTimeout flush — equals the batch
face on the same events, including matches that span micro-batches,
out-of-order arrivals inside the allowed lateness, and keys that go
quiet before their buffered suffix finalizes.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from tokforge.sources.requests import requests_df
from tokforge.streaming.job import read_sink
from tokforge.streaming.patterns import (
    classify_event,
    detect_pattern_batch,
    pattern_stream,
    sql_detect_pattern,
)

CHAIN = "resize:fit:32/quality:80/format:int16"


def _classifier():
    """Content-keyed alphabet for the synthetic fixture: the default
    payload-size classes (classify_event) are DEGENERATE per source here —
    source and n_tok both derive from doc_id mod a multiple of 4, so one
    source only ever emits one class.  tokens[0] = doc_id*MUL_A % VOCAB
    varies within every source."""
    t0 = F.element_at("tokens", 1) % 3
    return (
        F.when(t0 == 0, F.lit("S")).when(t0 == 1, F.lit("M")).otherwise(F.lit("L"))
    )


def _events(spark):
    """Request stream classified into a 3-symbol alphabet."""
    return (
        requests_df(spark, SF_SMALL, CHAIN)
        .withColumn("event", _classifier())
        .select("source", "doc_id", "event", "ts")
    )


def _batch_rows(spark, pattern, within_s, events=None):
    df = _events(spark) if events is None else events
    return sorted(
        (r["key"], r["start_ts"], r["end_ts"], r["first_id"], r["last_id"])
        for r in detect_pattern_batch(df, pattern, within_s).collect()
    )


def test_batch_face_matches_duckdb(spark):
    """Three-way anchor: the Spark lead()-window face and the DuckDB
    mirror agree row-for-row on the real fixture for a 3-symbol pattern
    with a wildcard."""
    pattern, within_s = ["S", "*", "L"], 600
    got = _batch_rows(spark, pattern, within_s)

    pdf = _events(spark).toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_detect_pattern(pattern, within_s, "events")
        ).fetchall()
    )
    assert got and got == want


def test_overlapping_and_horizon_semantics(spark):
    """AFTER MATCH SKIP TO NEXT ROW (overlaps allowed) + the WITHIN
    constraint, pinned on a hand-built sequence."""
    rows = [
        ("k", "d1", "A", "2024-01-01 00:00:00"),
        ("k", "d2", "A", "2024-01-01 00:00:10"),
        ("k", "d3", "A", "2024-01-01 00:00:20"),
        ("k", "d4", "B", "2024-01-01 00:02:00"),
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, event string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))

    # overlapping A A windows: (d1,d2) and (d2,d3)
    got = _batch_rows(spark, ["A", "A"], 60, events=df)
    assert [(r[3], r[4]) for r in got] == [("d1", "d2"), ("d2", "d3")]

    # A->B spans 100 s: inside a 200 s horizon, outside a 50 s one
    assert [(r[3], r[4]) for r in _batch_rows(spark, ["A", "B"], 200, events=df)] == [
        ("d3", "d4")
    ]
    assert _batch_rows(spark, ["A", "B"], 50, events=df) == []

    # contiguity: A A B exists, A B A does not
    assert _batch_rows(spark, ["A", "A", "B"], 600, events=df) != []
    assert _batch_rows(spark, ["A", "B", "A"], 600, events=df) == []


def _write_drop(df, path, i):
    df.coalesce(1).write.mode("append").parquet(f"{path}/drop={i}")


def _run(spark, tmp, pattern, within_s, watermark="5 seconds", classifier=None):
    """One availableNow run over whatever drops exist; state resumes from
    the shared checkpoint, so successive calls ARE successive
    micro-batches (+ a checkpoint-resume of the pattern state).  Default
    classifier = the `ops` column (hand-built rows carry the label there)."""
    from tokforge.streaming.queries import _drain  # noqa: PLC2701

    query, sink = pattern_stream(
        spark,
        f"{tmp}/in",
        f"{tmp}/out",
        f"{tmp}/ckpt",
        pattern,
        within_s,
        watermark=watermark,
        classifier=F.col("ops") if classifier is None else classifier,
    )
    _drain(query)
    return sink


def _req_rows(spark, rows):
    """Request-schema rows carrying the event label in `ops`."""
    base = [
        (d, k, 8, [1, 2, 3], t, e, "", 1, "int32")
        for (k, d, e, t) in rows
    ]
    return spark.createDataFrame(
        base,
        "doc_id string, source string, n_tok int, tokens array<int>, "
        "ts string, ops string, sig string, orientation int, src_dtype string",
    ).withColumn("ts", F.to_timestamp("ts"))


def _matches(spark, tmp):
    out = read_sink(spark, f"{tmp}/out")
    return sorted(
        (r["key"], r["first_id"], r["last_id"])
        for r in out.filter(F.col("key") != "__sentinel__").collect()
    )


def _sentinel(spark, ts):
    return _req_rows(spark, [("__sentinel__", "zz", "X", ts)])


def test_stream_equals_batch_face(spark, tmp_path):
    """The full job on the real fixture, drained over TWO micro-batches
    (ts-shifted replica arrives later -> matches SPAN the batch boundary),
    equals the batch face on the union of both drops."""
    tmp = str(tmp_path)
    req = requests_df(spark, SF_SMALL, CHAIN).filter(
        F.col("doc_id").cast("long") < 120
    )
    # the replica continues in FUTURE event time (above the post-drop-0
    # watermark, so nothing is late-dropped); cross-batch matches pair a
    # drop-0 tail event with a drop-1 head event
    shifted = req.withColumn(
        "ts", (F.unix_timestamp("ts") + 3 * 3600).cast("timestamp")
    ).withColumn("doc_id", F.concat(F.col("doc_id"), F.lit("-r2")))
    pattern, within_s = ["S", "L"], 3 * 3600

    cls = _classifier()
    _write_drop(req, f"{tmp}/in", 0)
    _run(spark, tmp, pattern, within_s, watermark="1 seconds", classifier=cls)
    _write_drop(shifted, f"{tmp}/in", 1)
    _run(spark, tmp, pattern, within_s, watermark="1 seconds", classifier=cls)
    for i, ts in ((2, "2030-01-01 00:00:00"), (3, "2030-01-02 00:00:00")):
        _write_drop(_sentinel(spark, ts), f"{tmp}/in", i)
        _run(spark, tmp, pattern, within_s, watermark="1 seconds", classifier=cls)

    both = req.unionByName(shifted).withColumn(
        "event", _classifier()
    ).select("source", "doc_id", "event", "ts")
    want = sorted(
        (r[0], r[3], r[4]) for r in _batch_rows(spark, pattern, within_s, events=both)
    )
    got = _matches(spark, tmp)
    assert got and got == want
    # cross-batch evidence: at least one match pairs a drop-0 first event
    # with a drop-1 (-r2) last event
    assert any(not f.endswith("-r2") and l.endswith("-r2") for _, f, l in got)


def test_out_of_order_arrival_is_reordered(spark, tmp_path):
    """The middle event of an A->B->C match arrives one micro-batch LATE
    (but inside the allowed lateness): the reorder buffer must still
    finalize the key's events in event-time order, or contiguity would
    read A,C,B and never match."""
    tmp = str(tmp_path)
    _write_drop(
        _req_rows(
            spark,
            [
                ("k", "d1", "A", "2024-01-01 00:00:00"),
                ("k", "d3", "C", "2024-01-01 00:02:00"),
            ],
        ),
        f"{tmp}/in",
        0,
    )
    _run(spark, tmp, ["A", "B", "C"], 600, watermark="30 minutes")
    _write_drop(
        _req_rows(spark, [("k", "d2", "B", "2024-01-01 00:01:00")]),
        f"{tmp}/in",
        1,
    )
    _run(spark, tmp, ["A", "B", "C"], 600, watermark="30 minutes")
    for i, ts in ((2, "2030-01-01 00:00:00"), (3, "2030-01-02 00:00:00")):
        _write_drop(_sentinel(spark, ts), f"{tmp}/in", i)
        _run(spark, tmp, ["A", "B", "C"], 600, watermark="30 minutes")

    assert _matches(spark, tmp) == [("k", "d1", "d3")]


def test_quiet_key_flushes_on_event_time_timeout(spark, tmp_path):
    """A key that never receives another row still emits its buffered
    matches once OTHER keys advance the global watermark — the
    EventTimeTimeout re-arm.  Key k gets a complete A->B match, then only
    sentinel-key drops arrive."""
    tmp = str(tmp_path)
    _write_drop(
        _req_rows(
            spark,
            [
                ("k", "d1", "A", "2024-01-01 00:00:00"),
                ("k", "d2", "B", "2024-01-01 00:00:30"),
            ],
        ),
        f"{tmp}/in",
        0,
    )
    _run(spark, tmp, ["A", "B"], 60, watermark="5 seconds")
    got_before = _matches(spark, tmp)
    for i, ts in ((1, "2030-01-01 00:00:00"), (2, "2030-01-02 00:00:00")):
        _write_drop(_sentinel(spark, ts), f"{tmp}/in", i)
        _run(spark, tmp, ["A", "B"], 60, watermark="5 seconds")

    assert _matches(spark, tmp) == [("k", "d1", "d2")]
    # and the match genuinely waited for the watermark, not the batch
    assert got_before == []


# ---------------------------------------------------------------------------
# Absence detection ("A with no B within T")
# ---------------------------------------------------------------------------


def test_absence_batch_matches_duckdb(spark):
    """Batch face == DuckDB mirror on the real fixture, and the horizon
    genuinely splits the A-population (some alerts, some closed)."""
    from tokforge.streaming.patterns import (
        detect_absence_batch,
        sql_detect_absence,
    )

    a, b, within_s = "S", "L", 40
    ev = _events(spark)
    got = sorted(
        tuple(r) for r in detect_absence_batch(ev, a, b, within_s).collect()
    )

    pdf = ev.toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    want = sorted(
        tuple(r)
        for r in con.execute(sql_detect_absence(a, b, within_s, "events")).fetchall()
    )
    n_a = sum(pdf["event"] == a)
    assert got == want
    assert 0 < len(got) < n_a


def _absence_run(spark, tmp, a, b, within_s, watermark="5 seconds"):
    from tokforge.streaming.patterns import absence_stream
    from tokforge.streaming.queries import _drain  # noqa: PLC2701

    query, sink = absence_stream(
        spark,
        f"{tmp}/in",
        f"{tmp}/out",
        f"{tmp}/ckpt",
        a,
        b,
        within_s,
        watermark=watermark,
        classifier=F.col("ops"),
    )
    _drain(query)
    return sink


def test_absence_stream_equals_batch(spark, tmp_path):
    """Streaming alerts == the batch face on a grid of arrangements:
    closed-in-time (no alert), closed-too-late (alert), never-closed
    (alert), B-before-A (no close), and a CROSS-micro-batch close where
    the B arrives one batch after its A."""
    from tokforge.streaming.patterns import detect_absence_batch

    tmp = str(tmp_path)
    a, b, within_s = "A", "B", 60
    drop0 = [
        ("k1", "d1", "A", "2024-01-01 00:00:00"),  # closed by B at +30 s
        ("k1", "d2", "B", "2024-01-01 00:00:30"),
        ("k1", "d3", "A", "2024-01-01 00:01:00"),  # B at +90 s: too late -> alert
        ("k1", "d4", "B", "2024-01-01 00:02:30"),
        ("k2", "d5", "B", "2024-01-01 00:00:00"),  # B before A: no close
        ("k2", "d6", "A", "2024-01-01 00:00:10"),  # never closed -> alert
        ("k3", "d7", "A", "2024-01-01 00:05:00"),  # closed CROSS-batch
    ]
    drop1 = [
        ("k3", "d8", "B", "2024-01-01 00:05:40"),
    ]
    _write_drop(_req_rows(spark, drop0), f"{tmp}/in", 0)
    _absence_run(spark, tmp, a, b, within_s)
    _write_drop(_req_rows(spark, drop1), f"{tmp}/in", 1)
    _absence_run(spark, tmp, a, b, within_s)
    for i, ts in ((2, "2030-01-01 00:00:00"), (3, "2030-01-02 00:00:00")):
        _write_drop(_sentinel(spark, ts), f"{tmp}/in", i)
        _absence_run(spark, tmp, a, b, within_s)

    out = read_sink(spark, f"{tmp}/out")
    got = sorted(
        (r["key"], r["doc_id"])
        for r in out.filter(F.col("key") != "__sentinel__").collect()
    )
    assert got == [("k1", "d3"), ("k2", "d6")]

    all_rows = _req_rows(spark, drop0 + drop1).withColumn(
        "event", F.col("ops")
    ).select("source", "doc_id", "event", "ts")
    want = sorted(
        (r["key"], r["doc_id"])
        for r in detect_absence_batch(all_rows, a, b, within_s).collect()
    )
    assert got == want
