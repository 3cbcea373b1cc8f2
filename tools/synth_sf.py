"""Synthesize a larger-SF copy of the driver's testdata tables for TIMING.

The driver's round-end measurement escalates to a driver-generated sf1.0
(BENCH_r07.json: documents=50k, events=1M, embeddings=20k) which is not
retained in the sandbox.  This tool writes a distribution-faithful replica
(same schemas, cardinalities, value ranges, single row group per file — the
driver's files are single-row-group, which matters for scan parallelism) so
optimization work can be measured at the scale the driver grades.

It is NOT byte-identical to the driver's data (seed/codepath unknown) and is
never used for correctness runs — only for relative before/after timing.

  python tools/synth_sf.py [scale] [out_dir]     # default 1.0 /root/sfsyn/sf1.0
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark line "
    "column order small sort join shuffle stage task plan query index page "
    "block cache disk read write memory core node group limit filter"
).split()

LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.145, 0.145]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]


def synth(scale: float, out_dir: str) -> None:
    rng = np.random.default_rng(42)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    n_docs = int(50000 * scale)
    n_events = int(1000000 * scale)
    n_emb = int(20000 * scale)
    n_users = int(15000 * scale)

    # documents: doc_id, text, lang, source, n_chars
    doc_id = np.arange(n_docs, dtype=np.int64)
    n_words = rng.integers(9, 116, size=n_docs)  # ~48..577 chars, mean ~297
    word_idx = rng.integers(0, len(WORDS), size=int(n_words.sum()))
    texts = []
    pos = 0
    for k in n_words:
        texts.append(" ".join(WORDS[i] for i in word_idx[pos : pos + k]))
        pos += k
    lang = rng.choice(LANGS, size=n_docs, p=LANG_P)
    source = np.array([f"src{i % 20}" for i in rng.permutation(n_docs)])
    tbl = pa.table(
        {
            "doc_id": doc_id,
            "text": texts,
            "lang": lang,
            "source": source,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(tbl, out / "documents.parquet", row_group_size=max(n_docs, 1))

    # events: event_id, ts (us, Jan 2024), user_id, event_type, value, props
    event_id = np.arange(n_events, dtype=np.int64)
    span_us = 30 * 24 * 3600 * 1_000_000
    base_us = np.int64(1704067200000000)  # 2024-01-01 UTC
    ts = base_us + rng.integers(0, span_us, size=n_events)
    ts = np.sort(ts) if False else ts  # driver data is not sorted by ts
    tbl = pa.table(
        {
            "event_id": event_id,
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": rng.integers(0, max(n_users, 1), size=n_events),
            "event_type": rng.choice(EVENT_TYPES, size=n_events),
            "value": np.round(rng.exponential(90.0, size=n_events), 2),
            "props": [f'{{"k": {int(v)}}}' for v in rng.integers(0, 100, size=n_events)],
        }
    )
    pq.write_table(tbl, out / "events.parquet", row_group_size=max(n_events, 1))

    # embeddings: vec_id, embedding list<float>[64], label
    vecs = rng.normal(0, 1, size=(n_emb, 64)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": np.arange(n_emb, dtype=np.int64),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), type=pa.float32()), 64
            ).cast(pa.list_(pa.float32())),
            "label": rng.integers(0, 10, size=n_emb).astype(np.int32),
        }
    )
    pq.write_table(tbl, out / "embeddings.parquet", row_group_size=max(n_emb, 1))
    (out / "_DONE").write_text("")
    print(json.dumps({"out": str(out), "docs": n_docs, "events": n_events, "emb": n_emb}))


if __name__ == "__main__":
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/sfsyn/sf1.0"
    synth(scale, out_dir)
