"""Substring-dedup layer throughput at sf0.1 (local[32]): duplicate-span
detection, coverage union-merge, repetition stats, and span removal on
the replica-amplified corpus.

NOTE on the workload shape: the synthetic token streams are arithmetic
progressions, so at high replica counts nearly EVERY k-gram repeats
corpus-wide — this benchmarks the ADVERSARIAL full-coverage case (all
positions marked, maximal span-window work), the worst case for the
post-join stages.  Real corpora mark a few percent of positions.

Usage: python tools/bench_substr.py [sf_dir] [replicas] [k] [min_count] [stride]

``stride`` > 1 samples every stride-th gram position before the
corpus-sized position join — the 100 TB recall/volume dial (r7 sweep
in BENCH.md; sampled runs merge since the r7 island fix, and spans
stay gap-free while stride <= k).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from tokforge.engine.session import build_spark  # noqa: E402
from tokforge.pipeline.substr import (  # noqa: E402
    dup_coverage,
    duplicate_spans,
    remove_spans,
    repetition_stats,
)
from tokforge.sources.requests import requests_df  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    min_count = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    stride = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    spark = build_spark(app_name="tokforge-bench-substr")
    spark.sparkContext.setLogLevel("ERROR")

    req = requests_df(spark, sf_dir, "substr", replicas)
    n_docs, n_tokens = req.select(F.count("*"), F.sum("n_tok")).first()
    req.select(F.sum(F.size("tokens"))).first()  # warm-up
    stages: dict[str, dict] = {}

    t = time.time()
    spans = duplicate_spans(req, k=k, min_count=min_count, stride=stride)
    n_spans = spans.count()
    w = time.time() - t
    stages["duplicate_spans"] = {
        "wall_s": round(w, 3),
        "spans": int(n_spans),
        "tokens_per_s": round(n_tokens / w),
    }

    t = time.time()
    cov = dup_coverage(req, k=k, min_count=min_count, stride=stride)
    tot_dup, tot_tok = cov.select(F.sum("dup_tokens"), F.sum("n_tok")).first()
    w = time.time() - t
    stages["dup_coverage"] = {
        "wall_s": round(w, 3),
        "dup_token_share": round(int(tot_dup) / int(tot_tok), 4),
        "tokens_per_s": round(n_tokens / w),
    }

    t = time.time()
    rep_docs = repetition_stats(req, k=k).count()
    w = time.time() - t
    stages["repetition_stats"] = {
        "wall_s": round(w, 3),
        "docs": int(rep_docs),
        "tokens_per_s": round(n_tokens / w),
    }

    t = time.time()
    removed_tokens = int(
        remove_spans(req, spans).select(F.sum(F.size("tokens"))).first()[0]
    )
    w = time.time() - t
    stages["remove_spans"] = {
        "wall_s": round(w, 3),
        "tokens_out": removed_tokens,
        "tokens_per_s": round(n_tokens / w),
    }

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "replicas": replicas,
                "k": k,
                "min_count": min_count,
                "stride": stride,
                "docs": int(n_docs),
                "tokens": int(n_tokens),
                "stages": stages,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
