"""Near-dup clustering capstone: pairs -> connected components -> one
canonical doc kept per cluster (the decision a training-data dedup
pipeline executes).  Deterministic known graphs + the real LSH-pairs
feed.  (Each connected_components call runs several join rounds on local
Spark, so the known-graph cases share ONE composite graph.)"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from tokforge.pipeline.dedup import (
    connected_components,
    keep_canonical,
    q_dedup_clusters,
    q_lsh_pairs,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a string, doc_b string")


def test_components_known_graph(spark):
    """One composite graph covering: a simple pair-chain cluster, two
    triangles merged by a bridge edge, and a 6-node path (diameter 5 —
    exercises the multi-round propagation loop)."""
    edges = (
        [("a", "b"), ("b", "c")]                       # {a,b,c}
        + [("p", "q"), ("q", "r"), ("p", "r"),
           ("x", "y"), ("y", "z"), ("x", "z"),
           ("r", "x")]                                  # bridge -> {p..z}
        + [(f"n{i}", f"n{i + 1}") for i in range(5)]    # path n0..n5
    )
    labels = connected_components(_pairs(spark, edges))
    comp = dict(labels.collect())
    labels.unpersist()
    assert {k: v for k, v in comp.items() if k in "abc"} == {
        "a": "a", "b": "a", "c": "a"
    }
    assert {comp[k] for k in ("p", "q", "r", "x", "y", "z")} == {"p"}
    assert {comp[f"n{i}"] for i in range(6)} == {"n0"}, "path must converge"


def test_components_stats_stay_bounded(spark):
    """Regression pin for the Catalyst stats-squaring trap (BENCH.md):
    localCheckpoint PRESERVES sizeInBytes into its LogicalRDD and every
    self-join round SQUARES it, so the estimate's digit count doubled
    per round (12 -> 2786 digits in 8 rounds) until the driver burned
    minutes in BigInteger products inside the stats visitor.  The
    parquet round boundary resets stats to real file sizes; assert the
    returned plan's estimate stays in honest-number territory on a
    graph deep enough to run many rounds."""
    chain = _pairs(spark, [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(60)])
    labels = connected_components(chain)
    digits = len(
        str(labels._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    assert digits < 30, f"stats estimate has {digits} digits — squaring is back"
    assert {v for _, v in labels.collect()} == {"c000"}


def test_components_match_union_find_oracle(spark):
    """Seeded random graphs vs a pure-python union-find oracle: the
    Spark clustering must assign every node the exact per-component
    minimum the oracle computes.  Three graph shapes in ONE composite
    graph (disjoint id prefixes): sparse random, dense random, and a
    star forest — different depth/width mixes for the propagation +
    pointer-jump rounds."""
    import random

    rng = random.Random(20260817)
    edges = []
    # sparse: 40 nodes, 25 edges
    edges += [
        (f"s{rng.randrange(40):02d}", f"s{rng.randrange(40):02d}")
        for _ in range(25)
    ]
    # dense: 12 nodes, 30 edges
    edges += [
        (f"d{rng.randrange(12):02d}", f"d{rng.randrange(12):02d}")
        for _ in range(30)
    ]
    # star forest: 4 hubs x 6 leaves
    edges += [(f"h{h}", f"h{h}l{i}") for h in range(4) for i in range(6)]
    edges = [(x, y) for x, y in edges if x != y]

    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in edges:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[rx] = ry
    roots: dict[str, list] = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    expected = {n: min(members) for members in roots.values() for n in members}

    got = dict(connected_components(_pairs(spark, edges)).collect())
    assert got == expected


def test_keep_canonical_decision(spark):
    docs = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",), ("f",)], "doc_id string"
    )
    out, labels = keep_canonical(docs, _pairs(spark, [("a", "b"), ("d", "e")]))
    rows = {r["doc_id"]: (r["component"], r["keep"]) for r in out.collect()}
    assert set(labels.columns) == {"doc_id", "component"}
    assert rows == {
        "a": ("a", True),
        "b": ("a", False),
        "d": ("d", True),
        "e": ("d", False),
        # unpaired docs are their own cluster and survive
        "c": ("c", True),
        "f": ("f", True),
    }


def test_clusters_consistent_with_lsh_pairs(spark):
    """On the real feed: both endpoints of every LSH pair share a
    component, and each component's label is one of its members (the
    minimum)."""
    labels = q_dedup_clusters(spark, SF_SMALL)
    comp = dict(labels.collect())
    labels.unpersist()
    pairs = q_lsh_pairs(spark, SF_SMALL).select("doc_a", "doc_b").collect()
    assert pairs, "fixture must produce candidate pairs"
    for r in pairs:
        assert comp[r["doc_a"]] == comp[r["doc_b"]], (r, "split cluster")
    for doc, label in comp.items():
        assert label <= doc  # canonical = minimum member


def test_components_match_recursive_sql_mirror(spark):
    """Round 7: the clustering now has a full SQL rendering — a DuckDB
    RECURSIVE min-label reachability CTE over the same LSH candidate
    pairs — not just the union-find python oracle.  Exact equality on
    the real corpus."""
    import duckdb

    from tokforge.pipeline.dedup import q_dedup_clusters, sql_connected_components

    got = sorted(
        (r["doc_id"], r["component"])
        for r in q_dedup_clusters(spark, SF_SMALL).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(sql_connected_components()).fetchall()))
    assert got and got == want
