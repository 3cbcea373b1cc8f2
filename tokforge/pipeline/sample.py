"""Token-budget stratified sampling — "give me <= B tokens per language
(or source), deterministically" — the corpus-assembly step a training-data
pipeline runs after dedup/quality filtering.

Semantics (shared by both implementations and the DuckDB mirror in
tests/test_budget_sample.py):

* Within each stratum, documents are laid out in a deterministic
  pseudo-random order: ``md5(cast(id as string))``, ties broken by the id
  itself.  md5 of the decimal string is identical in Spark and DuckDB, so
  the order — hence the sample — is oracle-mirrorable bit-for-bit, and it
  is independent of partitioning, input file order, and cluster size.
* A document is admitted while the running token total BEFORE it is still
  under the stratum's budget; the document that crosses the budget is
  the last one in.  Consequences (for budget >= 1; budget <= 0 yields an
  empty sample, pinned by test_assembly_edges): the sample is never empty
  for a non-empty stratum, total >= min(budget, stratum total), and
  overshoot is bounded by one document.

Two implementations, asserted row-identical:

* ``budget_sample`` — one window ``SUM(w) OVER (PARTITION BY stratum
  ORDER BY key)``.  Correct everywhere, but a window ORDER BY sorts each
  stratum inside ONE task: a 20 TB stratum funnels through one machine.
  This is the reference/oracle form.
* ``budget_sample_bucketed`` — the 100 TB shape.  The md5 key's first
  ``prefix_len`` hex chars split every stratum into 16^prefix_len buckets
  whose bucket-major order EQUALS the global key order (a string sorts by
  its prefix first), so the global prefix decomposes exactly:

    1. per-(stratum, bucket) token totals — one map-side-combinable agg
       shrinking the corpus to strata x buckets rows;
    2. a window over that TINY table computes each bucket's starting
       offset (runs on one task, but the table is KBs);
    3. offsets broadcast-join back; each bucket computes its LOCAL
       running total independently — max sort size is stratum/buckets.

  Buckets whose offset already exceeds the budget are dropped BEFORE the
  sort (partition pruning for free: at B << corpus, most of the data
  never sorts or shuffles past phase 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tokforge.sources.requests import load_documents


def _order_key(id_col: str):
    return F.md5(F.col(id_col).cast("string"))


def token_weight_col():
    """Whitespace token count of `text` — the same counting rule as
    pipeline.text.q_token_count's n_words."""
    return F.size(F.split(F.col("text"), " ")).cast("long")


def budget_sample(
    docs: DataFrame,
    budget: int,
    stratum_col: str = "lang",
    weight: "F.Column | None" = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reference implementation: one global window per stratum.  Returns
    the admitted rows with `w` (token weight) and `cum` (running total
    including the row) added."""
    w = weight if weight is not None else token_weight_col()
    d = docs.withColumn("w", w).withColumn("__key", _order_key(id_col))
    win = (
        Window.partitionBy(stratum_col)
        .orderBy("__key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum", F.sum("w").over(win))
        .filter(F.col("cum") - F.col("w") < F.lit(budget))
        .drop("__key")
    )


def budget_sample_bucketed(
    docs: DataFrame,
    budget: int,
    stratum_col: str = "lang",
    weight: "F.Column | None" = None,
    id_col: str = "doc_id",
    prefix_len: int = 2,
) -> DataFrame:
    """Scale implementation: decompose each stratum's prefix scan into
    16^prefix_len independent hash buckets (see module docstring).
    Row-identical to ``budget_sample`` for any prefix_len."""
    w = weight if weight is not None else token_weight_col()
    d = (
        docs.withColumn("w", w)
        .withColumn("__key", _order_key(id_col))
        .withColumn("__bucket", F.substring("__key", 1, prefix_len))
    )
    totals = d.groupBy(stratum_col, "__bucket").agg(F.sum("w").alias("__btotal"))
    off_win = (
        Window.partitionBy(stratum_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        stratum_col,
        "__bucket",
        F.coalesce(F.sum("__btotal").over(off_win), F.lit(0)).alias("__offset"),
    ).filter(F.col("__offset") < F.lit(budget))  # prune full buckets pre-sort
    local_win = (
        Window.partitionBy(stratum_col, "__bucket")
        .orderBy("__key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(F.broadcast(offsets), [stratum_col, "__bucket"])
        .withColumn("cum", F.col("__offset") + F.sum("w").over(local_win))
        .filter(F.col("cum") - F.col("w") < F.lit(budget))
        .drop("__key", "__bucket", "__offset")
    )


def q_budget_sample(
    spark: SparkSession, sf_dir: str, budget: int = 2000, bucketed: bool = False
) -> DataFrame:
    """Per-language token-budget sample over the documents table
    (pytest-covered; the driver registry stays at the 50-query window)."""
    docs = load_documents(spark, sf_dir)
    fn = budget_sample_bucketed if bucketed else budget_sample
    return fn(docs, budget).select("doc_id", "lang", "w", "cum")


def hash_split(
    docs: DataFrame,
    val_frac: float,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/validation split: a document lands in ``val``
    iff the first 8 hex digits of ``md5(salt || ':' || id)`` fall below
    ``val_frac`` of the 32-bit space, compared as HEX STRINGS — equal
    length lowercase hex compares exactly like the number it encodes, in
    Spark and DuckDB alike, so no hex-to-int conversion (and no engine
    divergence) is needed.

    Properties (tests/test_split.py): no RNG state, independent of
    partitioning and input order, stable across runs, and re-saltable —
    a new ``salt`` draws an independent split without touching the data.
    Expected val share is val_frac with binomial concentration per
    stratum (md5 is uniform), so stratified balance needs no stratum
    bookkeeping.  One narrow projection; zero shuffle.
    """
    if not (0.0 <= val_frac <= 1.0):
        raise ValueError(f"val_frac must be in [0, 1], got {val_frac}")
    thr = format(min(int(val_frac * 2**32), 2**32 - 1), "08x")
    is_val = F.lit(val_frac >= 1.0) | (
        (
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
                1,
                8,
            )
            < F.lit(thr)
        )
        & F.lit(val_frac > 0.0)
    )
    return docs.withColumn("split", F.when(is_val, "val").otherwise("train"))


def sql_hash_split(val_frac: float, id_col: str = "doc_id", salt: str = "split") -> str:
    """DuckDB twin of the split predicate, as a SELECT-able expression."""
    thr = format(min(int(val_frac * 2**32), 2**32 - 1), "08x")
    guard = "TRUE" if val_frac > 0.0 else "FALSE"
    always = "TRUE" if val_frac >= 1.0 else "FALSE"
    return (
        f"CASE WHEN {always} OR (substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 8)"
        f" < '{thr}' AND {guard}) THEN 'val' ELSE 'train' END"
    )
