"""Distributed BPE (tokforge/pipeline/bpe.py) three ways: the flat-buffer
merge kernel vs a pure-Python per-document scan (crafted overlap cases +
fuzz), pair counts vs a DuckDB zipped-unnest mirror on the requests
fixture, and the full train/apply loop vs a pure-Python trainer under
both exact (batch_size=1) and batched token-disjoint learning.
"""

from __future__ import annotations

import random
from collections import Counter

import duckdb
import numpy as np

from tests.conftest import SF_SMALL
from tokforge.constants import VOCAB
from tokforge.pipeline.bpe import (
    _merge_flat,
    apply_bpe,
    pair_counts,
    train_bpe,
)
from tokforge.sources.requests import requests_df, sql_requests_cte

# ---------------------------------------------------------------------------
# Pure-Python reference
# ---------------------------------------------------------------------------


def py_merge_doc(tokens, a, b, nid):
    out, i, n = [], 0, len(tokens)
    while i < n:
        if i + 1 < n and tokens[i] == a and tokens[i + 1] == b:
            out.append(nid)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def py_train(corpus, n_merges, batch_size=1, min_count=2):
    corpus = {k: list(v) for k, v in corpus.items()}
    merges = []
    while len(merges) < n_merges:
        k = min(batch_size, n_merges - len(merges))
        c = Counter()
        for toks in corpus.values():
            c.update(zip(toks, toks[1:]))
        cand = sorted(
            ((cnt, a, b) for (a, b), cnt in c.items() if cnt >= min_count),
            key=lambda t: (-t[0], t[1], t[2]),
        )[:k]
        picked, used = [], set()
        for cnt, a, b in cand:
            if a in used or b in used:
                continue
            nid = VOCAB + len(merges) + len(picked)
            picked.append((a, b, nid, cnt))
            used.update((a, b))
        if not picked:
            break
        for a, b, nid, cnt in picked:
            merges.append(
                {"rank": len(merges), "tok_a": a, "tok_b": b, "new_id": nid, "count": cnt}
            )
        for d in corpus:
            for a, b, nid, _ in picked:
                corpus[d] = py_merge_doc(corpus[d], a, b, nid)
    return merges, corpus


def py_apply(tokens, merges):
    for m in sorted(merges, key=lambda m: m["rank"]):
        tokens = py_merge_doc(tokens, m["tok_a"], m["tok_b"], m["new_id"])
    return tokens


# ---------------------------------------------------------------------------
# Flat-buffer kernel
# ---------------------------------------------------------------------------


def _flat(docs):
    values = np.array([t for d in docs for t in d], dtype=np.int64)
    rowmap = np.repeat(np.arange(len(docs)), [len(d) for d in docs]).astype(np.int64)
    return values, rowmap


def _unflat(values, rowmap, m):
    return [list(map(int, values[rowmap == r])) for r in range(m)]


def test_kernel_run_parity_cases():
    # a==b runs: left-to-right keeps even offsets within each run
    for doc, want in [
        ([7, 7, 7, 7], [99, 99]),
        ([7, 7, 7], [99, 7]),
        ([7, 7, 7, 7, 7], [99, 99, 7]),
        ([1, 7, 7, 7, 2, 7, 7], [1, 99, 7, 2, 99]),
    ]:
        v, rm = _flat([doc])
        out_v, out_rm = _merge_flat(v, rm, [(7, 7, 99)])
        assert _unflat(out_v, out_rm, 1)[0] == want
        assert py_merge_doc(doc, 7, 7, 99) == want


def test_kernel_never_merges_across_rows():
    docs = [[1, 2, 3], [4, 1, 2], [2, 4]]  # (3,4) and (2,... ) adjacency only within rows
    v, rm = _flat(docs)
    out_v, out_rm = _merge_flat(v, rm, [(3, 4, 99)])
    assert _unflat(out_v, out_rm, 3) == docs  # 3|4 spans a row boundary: untouched
    out_v, out_rm = _merge_flat(v, rm, [(1, 2, 99)])
    assert _unflat(out_v, out_rm, 3) == [[99, 3], [4, 99], [2, 4]]


def test_kernel_fuzz_vs_python():
    rng = random.Random(60601)
    for _ in range(200):
        docs = [
            [rng.randrange(5) for _ in range(rng.randrange(0, 14))]
            for _ in range(rng.randrange(1, 6))
        ]
        a, b = rng.randrange(5), rng.randrange(5)
        v, rm = _flat(docs)
        out_v, out_rm = _merge_flat(v, rm, [(a, b, 99)])
        assert _unflat(out_v, out_rm, len(docs)) == [
            py_merge_doc(d, a, b, 99) for d in docs
        ]


# ---------------------------------------------------------------------------
# pair_counts: python + DuckDB mirror on the requests fixture
# ---------------------------------------------------------------------------


def test_pair_counts_matches_duckdb(spark):
    req = requests_df(spark, SF_SMALL, "bpe")
    got = sorted(
        (r["tok_a"], r["tok_b"], r["cnt"]) for r in pair_counts(req).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'"
    )
    want = sorted(
        tuple(map(int, row))
        for row in con.execute(
            f"""WITH {sql_requests_cte()},
pairs AS (
  SELECT unnest(tokens[1:len(tokens)-1]) AS tok_a,
         unnest(tokens[2:len(tokens)]) AS tok_b
  FROM req
)
SELECT tok_a, tok_b, count(*) AS cnt FROM pairs GROUP BY 1, 2"""
        ).fetchall()
    )
    assert got == want
    # and vs the python counter on the same rows
    toks = {r["doc_id"]: r["tokens"] for r in req.select("doc_id", "tokens").collect()}
    c = Counter()
    for t in toks.values():
        c.update(zip(t, t[1:]))
    assert got == sorted((a, b, n) for (a, b), n in c.items())


# ---------------------------------------------------------------------------
# train / apply vs the python trainer
# ---------------------------------------------------------------------------


def _synth_corpus(rng, n_docs=24, alpha=8, max_len=40):
    return {
        str(i): [rng.randrange(alpha) for _ in range(rng.randrange(2, max_len))]
        for i in range(n_docs)
    }


def _spark_corpus(spark, corpus):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(corpus.items())], "doc_id string, tokens array<int>"
    ).repartition(4)


def _collect_tokens(df):
    return {r["doc_id"]: list(r["tokens"]) for r in df.collect()}


def test_train_exact_sequential(spark, tmp_path):
    rng = random.Random(7)
    corpus = _synth_corpus(rng)
    got_merges, got_corpus = train_bpe(
        _spark_corpus(spark, corpus), n_merges=8, scratch_dir=str(tmp_path)
    )
    want_merges, want_corpus = py_train(corpus, n_merges=8)
    assert got_merges == want_merges
    assert _collect_tokens(got_corpus) == want_corpus
    # causality: re-encoding the ORIGINAL corpus with the learned table
    # reproduces the training result (rank-order application is exact)
    reenc = apply_bpe(_spark_corpus(spark, corpus), got_merges)
    assert _collect_tokens(reenc) == want_corpus
    for d, toks in corpus.items():
        assert py_apply(toks, got_merges) == want_corpus[d]


def test_train_batched_disjoint(spark, tmp_path):
    rng = random.Random(11)
    corpus = _synth_corpus(rng, n_docs=30, alpha=6, max_len=50)
    got_merges, got_corpus = train_bpe(
        _spark_corpus(spark, corpus), n_merges=9, batch_size=3, scratch_dir=str(tmp_path)
    )
    want_merges, want_corpus = py_train(corpus, n_merges=9, batch_size=3)
    assert got_merges == want_merges
    assert _collect_tokens(got_corpus) == want_corpus


def test_apply_expand_roundtrip(spark, tmp_path):
    from tokforge.pipeline.bpe import expand_bpe

    rng = random.Random(21)
    corpus = _synth_corpus(rng, n_docs=20, alpha=6, max_len=40)
    merges, _ = train_bpe(
        _spark_corpus(spark, corpus), n_merges=10, batch_size=4,
        scratch_dir=str(tmp_path),
    )
    assert merges, "trainer learned something on a repetitive corpus"
    enc = apply_bpe(_spark_corpus(spark, corpus), merges)
    enc_tokens = _collect_tokens(enc)
    assert enc_tokens != corpus, "encoding actually changed the corpus"
    dec = expand_bpe(_spark_corpus(spark, {k: v for k, v in enc_tokens.items()}), merges)
    assert _collect_tokens(dec) == corpus
    # expansion of the RAW corpus is identity: no minted ids present
    assert _collect_tokens(expand_bpe(_spark_corpus(spark, corpus), merges)) == corpus


def test_train_stops_below_min_count(spark, tmp_path):
    # all-distinct tokens: no pair ever repeats, trainer learns nothing
    corpus = {"0": [1, 2, 3, 4], "1": [5, 6, 7, 8]}
    merges, out = train_bpe(
        _spark_corpus(spark, corpus), n_merges=5, scratch_dir=str(tmp_path)
    )
    assert merges == []
    assert _collect_tokens(out) == corpus


def test_pair_base_guard(spark):
    """Round-7 guard: minted ids must stay below PAIR_BASE or pair codes
    collide — train_bpe refuses up front, pair_counts refuses on data."""
    import pytest
    from tokforge.constants import VOCAB
    from tokforge.pipeline.bpe import PAIR_BASE, pair_counts, train_bpe

    df = spark.createDataFrame(
        [("d", [1, 2, 3])], "doc_id string, tokens array<int>"
    )
    with pytest.raises(ValueError, match="PAIR_BASE"):
        train_bpe(df, n_merges=PAIR_BASE - VOCAB + 1)
    bad = spark.createDataFrame(
        [("d", [PAIR_BASE, 1])], "doc_id string, tokens array<int>"
    )
    with pytest.raises(Exception, match="PAIR_BASE"):
        pair_counts(bad).collect()


def _py_standard_encode(seq, table):
    """Pure-Python standard BPE: repeat (lowest-rank pair present ->
    replace left-to-right non-overlapping) until fixpoint."""
    ranks = {(a, b): (r, nid) for r, (a, b, nid) in enumerate(table)}
    while True:
        best = None
        for x, y in zip(seq, seq[1:]):
            r = ranks.get((x, y))
            if r is not None and (best is None or r[0] < best[0]):
                best = (r[0], r[1], x, y)
        if best is None:
            return seq
        _, nid, x, y = best
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == x and seq[i + 1] == y:
                out.append(nid)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out


def test_apply_bpe_noncausal_exact_path(spark):
    """Verdict r6 item 4: on a non-causal imported table, rank-order
    apply DIVERGES from standard BPE; apply_bpe must auto-detect and
    take the exact path."""
    from tokforge.pipeline.bpe import apply_bpe, is_causal_merge_table

    Y, Z = 50258, 50259
    noncausal = [
        {"rank": 0, "tok_a": Y, "tok_b": 2, "new_id": Z},
        {"rank": 1, "tok_a": 1, "tok_b": 1, "new_id": Y},
    ]
    assert not is_causal_merge_table(noncausal)
    df = spark.createDataFrame([("d", [1, 1, 2])], "doc_id string, tokens array<int>")
    # forced fast path shows the divergence the validator protects against
    fast = apply_bpe(df, noncausal, exact=False).collect()[0]["tokens"]
    assert fast == [Y, 2]
    # auto path is exact: [1,1,2] -> [Y,2] -> [Z]
    auto = apply_bpe(df, noncausal).collect()[0]["tokens"]
    assert auto == [Z]

    # fuzz: exact path == pure-python standard encoder on a random
    # non-causal table over random docs
    rng = random.Random(1234)
    base = list(range(5))
    table = [(1, 1, 60001), (60002, 2, 60003), (0, 60001, 60002), (2, 3, 60004)]
    merges = [
        {"rank": r, "tok_a": a, "tok_b": b, "new_id": n}
        for r, (a, b, n) in enumerate(table)
    ]
    assert not is_causal_merge_table(merges)
    docs = [
        (str(i), [rng.choice(base) for _ in range(rng.randrange(0, 25))])
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    got = {r["doc_id"]: r["tokens"] for r in apply_bpe(df, merges).collect()}
    for d, t in docs:
        assert got[d] == _py_standard_encode(list(t), table), d


def test_apply_bpe_causal_fast_equals_exact(spark):
    """On a trained (causal) table the vectorized fast path and the
    exact path agree — the equivalence the causality validator relies on."""
    from tokforge.pipeline.bpe import apply_bpe, is_causal_merge_table, train_bpe

    rng = random.Random(77)
    docs = [
        (str(i), [rng.choice([1, 2, 3, 4]) for _ in range(rng.randrange(2, 30))])
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    merges, _ = train_bpe(df, n_merges=6)
    assert is_causal_merge_table(merges)
    fast = {r["doc_id"]: r["tokens"] for r in apply_bpe(df, merges, exact=False).collect()}
    exact = {r["doc_id"]: r["tokens"] for r in apply_bpe(df, merges, exact=True).collect()}
    assert fast == exact
