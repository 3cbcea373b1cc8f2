"""Corpus statistics for a tokens pipeline: global token frequencies,
top-V vocabulary with corpus-coverage mass, per-document OOV rate
against that vocabulary, and EXACT distributed quantiles of sequence
length per source.

Reference analog: the reference's monitoring/info surface reports
per-request and aggregate stats (monitoring.rs, the /info handler);
this module is the corpus-level equivalent a training-data pipeline
reports before/after filtering.

Scale shapes (the point of each design):

* ``token_frequencies`` — per-batch numpy partial counting inside ONE
  mapInArrow pass, so the Python->JVM hand-off is bounded by
  distinct-tokens-per-batch (<= |V|), never corpus token count; the
  JVM groupBy-sum adds map-side combine.  Same partial-agg shape as
  bpe.pair_counts.
* ``vocab_top`` — rank by (cnt desc, token asc) over the AGGREGATED
  frequency table: the sort touches <= |V| rows (50k-ish), not the
  corpus.
* ``oov_stats`` — the vocabulary is a bounded dimension table (top-V
  by construction), so membership travels to executors as a broadcast
  numpy array and the corpus side is one narrow ``np.isin`` pass — no
  explode, no per-token shuffle.  The rate division happens JVM-side
  (F.round) so the arithmetic stays SQL-mirrorable.
* ``length_quantiles`` — exact type-1 (lower) quantiles WITHOUT ever
  sorting the corpus: group to (source, n_tok) counts (bounded distinct
  values), one cumulative window over those counts per source, then
  value = min n_tok with cum >= ceil(q * total).  The window runs over
  the distinct-value table, so a 100 TB corpus quantile costs one
  count-shuffle plus a tiny windowed scan — the same reason the
  budget sampler's prefix sums are computed on aggregates.

Every face has a DuckDB mirror in tests/test_corpus_stats.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tokforge.pipeline.dedup import _flat_tokens


def token_frequencies(req: DataFrame) -> DataFrame:
    """Global unigram counts: (token, cnt)."""
    import pyarrow as pa

    def fn(batches):
        for batch in batches:
            values, _, _ = _flat_tokens(batch)
            if len(values):
                uniq, cnt = np.unique(values, return_counts=True)
            else:
                uniq = np.empty(0, dtype=np.int64)
                cnt = np.empty(0, dtype=np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(uniq.astype(np.int32), type=pa.int32()),
                    pa.array(cnt.astype(np.int64), type=pa.int64()),
                ],
                ["token", "cnt"],
            )

    partial = req.select("tokens").mapInArrow(fn, "token int, cnt long")
    return partial.groupBy("token").agg(F.sum("cnt").alias("cnt"))


def vocab_top(req: DataFrame, v: int) -> DataFrame:
    """Top-``v`` vocabulary: (token, cnt, rank, mass) where rank orders by
    (cnt desc, token asc) and ``mass`` is the cumulative fraction of all
    corpus tokens covered through this rank (the coverage curve), rounded
    to 6 places.  The windows run on the aggregated |V|-row table."""
    freq = token_frequencies(req)
    w_rank = Window.orderBy(F.desc("cnt"), F.asc("token"))
    ranked = freq.select(
        "token",
        "cnt",
        F.row_number().over(w_rank).alias("rank"),
        F.sum("cnt").over(w_rank.rowsBetween(Window.unboundedPreceding, 0)).alias("_cum"),
        F.sum("cnt").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_tot"),
    )
    return ranked.filter(F.col("rank") <= v).select(
        "token",
        "cnt",
        F.col("rank").cast("long").alias("rank"),
        F.round(F.col("_cum").cast("double") / F.col("_tot"), 6).alias("mass"),
    )


def oov_stats(req: DataFrame, v: int, vocab: DataFrame | None = None) -> DataFrame:
    """Per-document out-of-vocabulary stats against the top-``v`` vocab:
    (doc_id, n_tok, oov_cnt, oov_rate).

    The vocab is collected to the driver as a sorted int array — it is a
    bounded dimension table (``v`` rows) exactly like the IVF codebook,
    and ships to executors in the task closure.  The corpus pass is one
    narrow ``np.isin``; the rate division stays JVM-side for exact SQL
    mirroring (CAST AS DOUBLE, round 6).

    ``vocab`` (any DataFrame with a ``token`` column, e.g. a persisted
    ``vocab_top`` result) skips the internal vocabulary build — pass it
    when scoring several corpora against one vocabulary.
    """
    import pyarrow as pa

    vocab_rows = (vocab if vocab is not None else vocab_top(req, v)).select(
        "token"
    ).collect()
    vocab_arr = np.sort(np.array([r["token"] for r in vocab_rows], dtype=np.int64))

    def fn(batches):
        for batch in batches:
            values, rowmap, lengths = _flat_tokens(batch)
            m = batch.num_rows
            if len(values):
                oov = np.bincount(
                    rowmap[~np.isin(values, vocab_arr)], minlength=m
                ).astype(np.int64)
            else:
                oov = np.zeros(m, dtype=np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.array(lengths.astype(np.int64), type=pa.int64()),
                    pa.array(oov, type=pa.int64()),
                ],
                ["doc_id", "n_tok", "oov_cnt"],
            )

    counted = req.select(
        F.col("doc_id").cast("string").alias("doc_id"), "tokens"
    ).mapInArrow(fn, "doc_id string, n_tok long, oov_cnt long")
    return counted.select(
        "doc_id",
        "n_tok",
        "oov_cnt",
        F.round(
            F.col("oov_cnt").cast("double") / F.greatest(F.col("n_tok"), F.lit(1)), 6
        ).alias("oov_rate"),
    )


def length_quantiles(req: DataFrame, qs: tuple = (0.5, 0.9, 0.99)) -> DataFrame:
    """Exact per-source type-1 quantiles of ``n_tok``: (source, q, value)
    with value = min n_tok whose cumulative count reaches ceil(q * total).
    """
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs!r}")
    spark = req.sparkSession
    counts = req.groupBy("source", "n_tok").agg(F.count("*").alias("c"))
    w_cum = Window.partitionBy("source").orderBy("n_tok")
    w_tot = Window.partitionBy("source")
    cum = counts.select(
        "source",
        "n_tok",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_tot).alias("total"),
    )
    qdf = spark.createDataFrame([(float(q),) for q in sorted(qs)], "q double")
    return (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("total")).cast("long"))
        .groupBy("source", "q")
        .agg(F.min("n_tok").cast("long").alias("value"))
    )
