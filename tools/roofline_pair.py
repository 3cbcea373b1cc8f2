"""Hardware-ceiling control for the N -> 4N scaling gate: the SAME
flagship kernel workload (12-op chain through apply_plan_rect — the
component that dominates the Spark pipeline's executor time) run as
plain multiprocessing with 1 worker vs 4 workers, NO Spark.

Why this exists: the gate pair `local-cluster[1,1] -> local-cluster[4,1]`
shares ONE socket's memory bus in this sandbox, so its efficiency is
bounded above by how the box's memory system scales from 1 to 4 active
cores — a property of the hardware, not the engine.  This tool measures
that bound with the engine's own kernel stripped of every Spark layer
(no scheduler, no shuffle, no Python<->JVM boundary): each worker owns a
private pre-faulted input matrix and loops the identical chain, so any
sub-linearity is bus contention alone.  BENCH.md reports the Spark
pair's efficiency NEXT TO this ceiling: efficiency_normalized =
eff_spark / eff_hardware.  A normalized value ~1.0 means the engine
delivers all the scaling the machine has to give — the cluster-relevant
claim, since real executors own their bus (docs/SCALE.md).

Method mirrors bench_scaling.py: fresh-subprocess launches (the box's
slow mode grips whole processes), best-of-N launches retained raw, 6
timed passes per launch after an untimed warm-up.

Usage:
  python tools/roofline_pair.py                  # parent: both levels, JSON out
  python tools/roofline_pair.py --run 4          # child: one level
Env: TOKFORGE_ROOFLINE_LAUNCHES=6, TOKFORGE_ROOFLINE_ROWS=65536,
     TOKFORGE_ROOFLINE_PASSES=6, TOKFORGE_ROOFLINE_TAG=<tag>
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_TOK = 250  # the testdata documents' token-count scale
FLAGSHIP_CHAIN = (
    "resize:fill:128:0:1:1/gravity:ce/padding:4/rotate:90/brightness:25/"
    "contrast:1.2/saturation:0.8/blur:1.5/sharpen:0.8/pixelate:4/"
    "watermark:0.6:soea/background:336699/quality:80/format:jpeg"
)


def _worker(rows: int, passes: int, out_q) -> None:
    import numpy as np

    from tokforge.engine.config import EngineConfig
    from tokforge.engine.transform import _plan_for
    from tokforge.operators.kernel_rect import apply_plan_rect

    cfg = EngineConfig()
    plan = _plan_for(FLAGSHIP_CHAIN, cfg)
    rng = np.random.default_rng(12345)
    mat = rng.integers(0, 255, size=(rows, N_TOK), dtype=np.int64)
    ori = np.ones(rows, dtype=np.int64)

    def once() -> float:
        t0 = time.time()
        apply_plan_rect(
            mat, plan, orientations=ori, src_dtype="uint8",
            default_format=cfg.default_format,
        )
        return time.time() - t0

    once()  # warm-up: page-fault the heap high-water mark untimed
    samples = [once() for _ in range(passes)]
    out_q.put({"pass_seconds": samples, "tokens": rows * N_TOK})


def run_level(n_workers: int, rows: int, passes: int) -> dict:
    ctx = mp.get_context("spawn")  # fresh interpreters: no shared pages
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(rows, passes, q))
        for _ in range(n_workers)
    ]
    t0 = time.time()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.time() - t0
    # aggregate throughput per pass index: all workers run pass k
    # concurrently (same loop count, near-lockstep after the barrier-free
    # start), so per-pass aggregate = sum of tokens / max worker time
    per_pass = []
    for k in range(passes):
        tot_tokens = sum(r["tokens"] for r in results)
        slowest = max(r["pass_seconds"][k] for r in results)
        per_pass.append(tot_tokens / slowest)
    best = max(per_pass)
    return {
        "workers": n_workers,
        "rows_per_worker": rows,
        "pass_tokens_per_sec": [int(x) for x in per_pass],
        "tokens_per_sec": int(best),
        "wall_seconds": round(wall, 3),
    }


def main() -> None:
    # 65536 rows x 250 tokens = 16.4M tokens/pass: ~2 s per 1-core pass,
    # comfortably above timer noise, ~130 MB resident per worker
    rows = int(os.environ.get("TOKFORGE_ROOFLINE_ROWS", "65536"))
    passes = int(os.environ.get("TOKFORGE_ROOFLINE_PASSES", "6"))
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        print(json.dumps(run_level(int(sys.argv[2]), rows, passes)))
        return

    launches = int(os.environ.get("TOKFORGE_ROOFLINE_LAUNCHES", "6"))
    tag = os.environ.get("TOKFORGE_ROOFLINE_TAG", time.strftime("%Y%m%d-%H%M%S"))
    raw = []
    best = {}
    for level in (1, 4):
        for li in range(launches):
            out = subprocess.run(
                [sys.executable, __file__, "--run", str(level)],
                capture_output=True, text=True,
                cwd=str(Path(__file__).resolve().parent.parent),
            )
            if out.returncode != 0:
                raw.append({"workers": level, "launch": li,
                            "error": (out.stderr or "")[-1500:]})
                continue
            res = json.loads(out.stdout.strip().splitlines()[-1])
            res["launch"] = li
            raw.append(res)
            print(json.dumps(res))
            if level not in best or res["tokens_per_sec"] > best[level]["tokens_per_sec"]:
                best[level] = res
    eff = (best[4]["tokens_per_sec"] / best[1]["tokens_per_sec"]) / 4
    summary = {
        "metric": "hardware ceiling: flagship kernel, multiprocessing 1 -> 4 workers",
        "tokens_per_sec_1": best[1]["tokens_per_sec"],
        "tokens_per_sec_4": best[4]["tokens_per_sec"],
        "hardware_scaling_efficiency": round(eff, 3),
        "launches_per_level": launches,
        "passes_per_launch": passes,
        "rows_per_worker": rows,
    }
    print(json.dumps(summary))
    runs_dir = Path(__file__).resolve().parent.parent / "bench_runs"
    runs_dir.mkdir(exist_ok=True)
    path = runs_dir / f"roofline_pair_{tag}.json"
    path.write_text(json.dumps({"summary": summary, "launches": raw}, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
