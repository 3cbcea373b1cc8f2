"""Single-process microbench for apply_plan_rect (the flagship/simple
transform compute core) — lets kernel micro-optimizations iterate without
a full Spark bench run.  Times one (rows, n) bucket through a parsed ops
chain, best-of-N after warm-up; also asserts the rect output still equals
the per-row kernel on a sample (the bit-exactness invariant).

  python tools/bench_kernel_rect.py [chain] [rows] [n] [repeat]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tokforge.engine.config import EngineConfig  # noqa: E402
from tokforge.engine.transform import _plan_for  # noqa: E402
from tokforge.operators.kernel import apply_plan  # noqa: E402
from tokforge.operators.kernel_rect import apply_plan_rect  # noqa: E402

FLAGSHIP = (
    "resize:fill:128:0:1:1/gravity:ce/padding:4/rotate:90/brightness:25/"
    "contrast:1.2/saturation:0.8/blur:1.5/sharpen:0.8/pixelate:4/"
    "watermark:0.6:soea/background:336699/quality:80/format:jpeg"
)
SIMPLE = "resize:fit:64/crop:48:0:ce/quality:80/format:int16"


def main() -> None:
    chain = sys.argv[1] if len(sys.argv) > 1 else FLAGSHIP
    if chain == "simple":
        chain = SIMPLE
    elif chain == "flagship":
        chain = FLAGSHIP
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    repeat = int(sys.argv[4]) if len(sys.argv) > 4 else 7

    cfg = EngineConfig()
    plan = _plan_for(chain, cfg)
    rng = np.random.default_rng(42)
    mat = rng.integers(0, 50257, size=(rows, n), dtype=np.int64)
    oris = (1 + rng.integers(0, 8, size=rows)).astype(np.int64)

    # exactness spot-check vs the per-row kernel on 64 sampled rows
    out = apply_plan_rect(mat, plan, orientations=oris, src_dtype="int32",
                          default_format=cfg.default_format)
    idx = rng.choice(rows, size=min(64, rows), replace=False)
    for i in idx:
        ref = apply_plan(mat[i].tolist(), plan, orientation=int(oris[i]),
                         src_dtype="int32", default_format=cfg.default_format)
        assert list(out.tokens[i]) == list(ref.tokens), f"row {i} diverged"
        assert int(out.size_bytes[i]) == ref.size_bytes
        assert int(out.quality[i]) == ref.quality
    print("exactness vs per-row kernel: OK (64 sampled rows)")

    best = None
    for _ in range(repeat):
        t0 = time.time()
        apply_plan_rect(mat, plan, orientations=oris, src_dtype="int32",
                        default_format=cfg.default_format)
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    toks = rows * n
    print(f"rows={rows} n={n}: best {best*1000:.1f} ms "
          f"({toks/best/1e6:.1f}M tokens/s single-core)")


if __name__ == "__main__":
    main()
