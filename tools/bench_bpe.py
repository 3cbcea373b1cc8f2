"""Tokenizer-layer throughput at sf0.1 (local[32]): the distributed BPE
pair-count pass, the full training loop (token-disjoint batched rounds
through parquet stage boundaries), re-encoding the corpus with the
learned table, and the corpus-statistics faces (top-V vocab, OOV pass,
exact length quantiles).

Prints one JSON line with per-stage wall seconds and tokens/s for the
corpus-proportional passes (count / apply / oov).

Usage: python tools/bench_bpe.py [sf_dir] [replicas] [n_merges] [batch]

``replicas`` > 1 amplifies the corpus R-fold via the engine's replica id
spaces (sources/requests.py REPLICA_STRIDE) — each copy carries distinct
token content because tokens derive from doc_id, so pair statistics stay
non-degenerate under amplification.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from tokforge.engine.session import build_spark  # noqa: E402
from tokforge.pipeline.bpe import apply_bpe, pair_counts, train_bpe  # noqa: E402
from tokforge.pipeline.stats import (  # noqa: E402
    length_quantiles,
    oov_stats,
    vocab_top,
)
from tokforge.sources.requests import requests_df  # noqa: E402

TOP_V = 1024


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    spark = build_spark(app_name="tokforge-bench-bpe")
    spark.sparkContext.setLogLevel("ERROR")

    req = requests_df(spark, sf_dir, "bpe", replicas)
    n_docs, n_tokens = req.select(
        F.count("*"), F.sum("n_tok")
    ).first()
    stages: dict[str, dict] = {}

    # warm-up: fault pages + JIT the scan path once before timing
    req.select(F.sum(F.size("tokens"))).first()

    t = time.time()
    n_pairs, pair_instances = pair_counts(req).select(
        F.count("*"), F.sum("cnt")
    ).first()
    w = time.time() - t
    stages["pair_counts"] = {
        "wall_s": round(w, 3),
        "distinct_pairs": int(n_pairs),
        "pair_instances": int(pair_instances),
        "tokens_per_s": round(n_tokens / w),
    }

    t = time.time()
    merges, trained = train_bpe(req, n_merges=n_merges, batch_size=batch)
    w = time.time() - t
    rounds = (len(merges) + batch - 1) // batch if merges else 0
    stages["train_bpe"] = {
        "wall_s": round(w, 3),
        "merges_learned": len(merges),
        "batch_size": batch,
        "rounds": rounds,
        "wall_s_per_round": round(w / max(rounds, 1), 3),
        "top_merge_count": merges[0]["count"] if merges else None,
    }
    trained_tokens = int(trained.select(F.sum(F.size("tokens"))).first()[0])

    t = time.time()
    reenc_tokens = int(
        apply_bpe(req, merges).select(F.sum(F.size("tokens"))).first()[0]
    )
    w = time.time() - t
    stages["apply_bpe"] = {
        "wall_s": round(w, 3),
        "tokens_in_per_s": round(n_tokens / w),
        "tokens_out": reenc_tokens,
        "matches_trained_corpus_total": reenc_tokens == trained_tokens,
    }

    t = time.time()
    vocab_rows = vocab_top(req, TOP_V).count()
    stages["vocab_top"] = {"wall_s": round(time.time() - t, 3), "rows": int(vocab_rows)}

    t = time.time()
    oov_docs = oov_stats(req, TOP_V).count()
    w = time.time() - t
    stages["oov_stats"] = {
        "wall_s": round(w, 3),
        "docs": int(oov_docs),
        "tokens_per_s": round(n_tokens / w),
    }

    t = time.time()
    q_rows = length_quantiles(req).count()
    stages["length_quantiles"] = {
        "wall_s": round(time.time() - t, 3),
        "rows": int(q_rows),
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
