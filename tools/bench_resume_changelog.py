"""Changelog-checkpointing A/B on the volume kill/resume scenario
(VERDICT r6 item 7: SCALE.md names changelog checkpointing as the
state-restore lever but the claim was unmeasured).

Replays tests/test_streaming.py::test_volume_checkpoint_resume_rocksdb's
exact shape — the 720k-row sustained layout (sf0.1 x24 replicas, 6
event-time drops) on the RocksDB provider, killed after the first
committed batch, resumed from the checkpoint — once with
`rocksdb.changelogCheckpointing.enabled=true` (the engine default,
session.py) and once with it forced off (full-snapshot uploads per
batch).  Each mode runs in a FRESH subprocess (fresh JVM: no provider
state or slow-mode bleed between modes).

Records per mode: phase-1 wall (includes the snapshot-vs-delta commit
cost while running), recovery wall, the engine-attributed trigger /
addBatch split, the pre-first-trigger remainder (query restart +
offset-log replay + RocksDB RESTORE — where changelog-off pays full
snapshot download), and per-batch state-commit times.

Usage: python tools/bench_resume_changelog.py          (parent, both modes)
       python tools/bench_resume_changelog.py --run on <tmp>   (child)
Artifact: bench_runs/resume_changelog.json; table in docs/SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"
REPLICAS = 24
DROPS = 6
CHAIN = "resize:fit:64/format:int16"


def child(mode: str, tmp: str) -> dict:
    import pyspark.sql.functions as F

    from tokforge.engine.config import EngineConfig
    from tokforge.engine.session import apply_state_store, build_spark
    from tokforge.sources.requests import requests_df
    from tokforge.streaming.job import read_sink, transform_stream

    spark = build_spark(app_name=f"tokforge-resume-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    apply_state_store(spark, "rocksdb")
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true" if mode == "on" else "false",
    )
    in_path, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    req = requests_df(spark, SF_DIR, CHAIN, replicas=REPLICAS).repartition(32)
    for i in range(DROPS):
        req.withColumn(
            "ts", (F.unix_timestamp("ts") + i * 600).cast("timestamp")
        ).write.mode("append").parquet(f"{in_path}/drop={i}")
    n_total = spark.read.parquet(in_path).count()

    cfg = EngineConfig(state_store="rocksdb")
    t0 = time.time()
    q1, _ = transform_stream(
        spark, in_path, out_dir, ckpt, cfg,
        verify=False, available_now=True, max_files_per_trigger=24,
    )
    deadline = time.time() + 300
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in q1.recentProgress):
            break
        time.sleep(0.05)
    q1.stop()
    q1.awaitTermination(60)
    phase1_s = time.time() - t0
    partial = read_sink(spark, out_dir).count()
    assert 0 < partial < n_total, (partial, n_total)

    t_resume = time.time()
    q2, _ = transform_stream(
        spark, in_path, out_dir, ckpt, cfg,
        verify=False, available_now=True, max_files_per_trigger=48,
    )
    q2.awaitTermination(600)
    recovery_s = time.time() - t_resume
    batches = []
    for p in q2.recentProgress:
        so = (p.get("stateOperators") or [{}])[0]
        batches.append(
            {
                "batchId": p["batchId"],
                "numInputRows": p["numInputRows"],
                "triggerMs": p["durationMs"].get("triggerExecution", 0),
                "addBatchMs": p["durationMs"].get("addBatch", 0),
                "stateCommitMs": so.get("commitTimeMs", 0),
            }
        )
    total = read_sink(spark, out_dir).count()
    dup = total - read_sink(spark, out_dir).select(
        "cache_key", "doc_id", "ts"
    ).distinct().count()
    spark.stop()
    trigger_s = sum(b["triggerMs"] for b in batches) / 1000.0
    return {
        "mode": mode,
        "rows_total": int(total),
        "duplicates": int(dup),
        "rows_before_kill": int(partial),
        "phase1_seconds": round(phase1_s, 3),
        "recovery_seconds": round(recovery_s, 3),
        "recovery_trigger_seconds": round(trigger_s, 3),
        "recovery_addbatch_seconds": round(
            sum(b["addBatchMs"] for b in batches) / 1000.0, 3
        ),
        "recovery_pre_trigger_seconds": round(recovery_s - trigger_s, 3),
        "state_commit_seconds": round(
            sum(b["stateCommitMs"] for b in batches) / 1000.0, 3
        ),
        "recovery_batches": batches,
    }


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--run":
        print(json.dumps(child(sys.argv[2], sys.argv[3])))
        return
    results = {}
    for mode in ("on", "off"):
        tmp = tempfile.mkdtemp(prefix=f"tokforge-resume-{mode}-")
        try:
            out = subprocess.run(
                [sys.executable, str(Path(__file__).resolve()), "--run", mode, tmp],
                capture_output=True, text=True,
                cwd=str(Path(__file__).resolve().parent.parent),
            )
            if out.returncode != 0:
                results[mode] = {"error": (out.stderr or "")[-3000:]}
            else:
                results[mode] = json.loads(out.stdout.strip().splitlines()[-1])
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        print(mode, json.dumps({k: v for k, v in results[mode].items()
                                if k != "recovery_batches"}), flush=True)
    runs = Path(__file__).resolve().parent.parent / "bench_runs"
    runs.mkdir(exist_ok=True)
    (runs / "resume_changelog.json").write_text(json.dumps(results, indent=1))
    print("wrote bench_runs/resume_changelog.json")


if __name__ == "__main__":
    main()
