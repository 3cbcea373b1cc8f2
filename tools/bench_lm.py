"""Bigram-LM scoring throughput at volume (round 7): corpus pair/unigram
counting, per-doc integer-micronat scoring, and perplexity bucketing on
the replica-amplified request stream.

Usage: python tools/bench_lm.py [sf_dir] [replicas]
Artifacts land in bench_runs/; table in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from tokforge.engine.session import build_spark  # noqa: E402
from tokforge.pipeline.lm import lm_score, ppl_buckets  # noqa: E402
from tokforge.sources.requests import requests_df  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = build_spark(app_name="tokforge-bench-lm")
    spark.sparkContext.setLogLevel("ERROR")
    req = requests_df(spark, sf_dir, "lm", replicas)
    n_docs, n_tokens = req.select(F.count("*"), F.sum("n_tok")).first()
    req.select(F.sum(F.size("tokens"))).first()  # warm-up
    stages: dict[str, dict] = {}

    t = time.time()
    sc = lm_score(req)
    agg = sc.agg(
        F.count("*").alias("docs"), F.sum("n_pairs").alias("pairs")
    ).first()
    w = time.time() - t
    stages["lm_score"] = {
        "wall_s": round(w, 3),
        "docs": int(agg["docs"]),
        "pairs": int(agg["pairs"]),
        "tokens_per_s": round(n_tokens / w),
    }

    t = time.time()
    bk = ppl_buckets(req)
    dist = {r["bucket"]: r["n"] for r in bk.groupBy("bucket").agg(
        F.count("*").alias("n")).collect()}
    w = time.time() - t
    stages["ppl_buckets"] = {
        "wall_s": round(w, 3),
        "distribution": dist,
        "tokens_per_s": round(n_tokens / w),
    }

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "replicas": replicas,
                "docs": int(n_docs),
                "tokens": int(n_tokens),
                "stages": stages,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
