"""Sequence packing for pretraining batches (concat-and-chunk).

The standard GPT-style packer concatenates every document's token
stream in a pinned global order and chunks the stream into fixed
``budget``-token training sequences; documents straddle sequence
boundaries (no padding, no per-bin search).  This module computes the
ASSIGNMENT — for each doc, which sequence its first token lands in and
at what offset — which is what a downstream loader needs to
materialize batches, and what dataset tooling needs to audit document
/ sequence boundaries (e.g. boundary-crossing fractions).

Scale path: the assignment is an exclusive prefix sum of token counts
over the (doc_id asc) order.  A single-partition window would
serialize the corpus, so the classic two-pass distributed scan is used
instead:

1. bucket rows by DETERMINISTIC doc_id ranges (equal-width slices of
   [min, max], derived from one exact min/max aggregation — NOT
   ``repartitionByRange``, whose sampled boundaries can differ between
   the base-collect job and the consumer job, silently mis-basing
   rows) and running-sum WITHIN each bucket via an ordinary window —
   embarrassingly parallel;
2. collect the P per-bucket totals (a driver relation the size of the
   bucket count, same O(1)-file discipline as the dictionary bounds
   sidecar), prefix-sum them on the driver, and add each bucket's base
   offset back as a literal map lookup.

Within-bucket sums + bucket bases compose associatively, so the output
equals the serial prefix sum exactly.  Equal-width slicing is the
honest deterministic layout: a pathologically sparse doc_id domain can
skew bucket sizes, but any SAMPLED balancing would reintroduce the
cross-job nondeterminism.  ``doc_id`` must be unique (the documents
schema pins it) — duplicate ids would make the within-bucket tie order
ambiguous.  Zero-token docs occupy a position but advance nothing —
they get the (seq_id, offset) where they *would* start, mirrored
exactly by the SQL window oracle.

No reference counterpart (the reference is a retrieval engine); this
is part of the training-data pipeline surface the task brief demands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chearch_spark.functions.text import TOKENS_SQL

DEFAULT_PACK_BUCKETS = 256


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = DEFAULT_PACK_BUCKETS,
) -> DataFrame:
    """Assign every document its packed position: (doc_id, n_tokens,
    seq_id, offset) where ``seq_id = floor(before / budget)`` and
    ``offset = before % budget``, with ``before`` the exclusive prefix
    sum of ``n_tokens`` in doc_id order.  ``budget`` is the training
    sequence length in tokens; ``num_buckets`` bounds the parallelism
    of the distributed scan (and the size of the driver-side base
    collect)."""
    budget = int(budget)
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    num_buckets = int(num_buckets)
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be > 0, got {num_buckets}")
    from chearch_spark.functions.parallel import spread_small_scan

    # r7: both tokenize passes (the totals job and the returned plan)
    # derive from `counts`; the size-guarded spread keeps them from
    # serializing on 1-2 parquet splits for few-MB corpora
    df = spread_small_scan(df)
    # r7: the packer consumes only the token COUNT, never the tokens —
    # regexp_count of the positive token alphabet counts the same
    # maximal [a-z0-9_] runs the tokenizer extracts (row-identical to
    # size(tokens_col), pinned by the oracle gate) without
    # materializing a string array per row on either pass
    from chearch_spark import spec as _spec

    n_tokens = F.regexp_count(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit(_spec.TOKEN_RE),
    )
    counts = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_tokens.cast("long").alias("n_tokens"),
    )
    # bounds from the RAW id column — the id-only projection skips the
    # tokenize work, so the full-corpus tokenize runs twice (totals +
    # the returned plan), not three times
    bounds = df.agg(
        F.min(F.col(id_col).cast("long")).alias("lo"),
        F.max(F.col(id_col).cast("long")).alias("hi"),
    ).first()
    if bounds["lo"] is None:
        return counts.select(
            "doc_id",
            "n_tokens",
            F.lit(0).cast("long").alias("seq_id"),
            F.lit(0).cast("long").alias("offset"),
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, -(-(hi - lo + 1) // num_buckets))  # ceil division
    bucketed = counts.withColumn(
        "__bkt", ((F.col("doc_id") - F.lit(lo)) / F.lit(width)).cast("long")
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("__local_incl", F.sum("n_tokens").over(w))
    # pass 2: per-bucket totals -> driver prefix sum -> base map.
    # Buckets are pure doc_id arithmetic, so the totals job and the
    # consumer job agree on every row's bucket by construction.
    totals = (
        bucketed.groupBy("__bkt")
        .agg(F.sum("n_tokens").alias("__total"))
        .collect()
    )
    base, bases = 0, {}
    for row in sorted(totals, key=lambda r: r["__bkt"]):
        bases[int(row["__bkt"])] = base
        base += int(row["__total"] or 0)
    base_expr = F.element_at(
        F.create_map(
            *[
                x
                for b, v in bases.items()
                for x in (F.lit(b).cast("long"), F.lit(v).cast("long"))
            ]
        ),
        F.col("__bkt"),
    )
    before = base_expr + F.col("__local_incl") - F.col("n_tokens")
    return local.select(
        "doc_id",
        "n_tokens",
        F.floor(before / budget).cast("long").alias("seq_id"),
        (before % budget).cast("long").alias("offset"),
    )


def pack_sequences_sql(
    budget: int, table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB mirror: the same assignment via one window prefix sum
    (the oracle may serialize — it exists to pin values, not scale)."""
    toks = TOKENS_SQL.format(t=text_col)
    return f"""
WITH counts AS (
  SELECT doc_id, CAST(len({toks}) AS BIGINT) AS n_tokens
  FROM {table}
), pref AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS before
  FROM counts
)
SELECT doc_id, n_tokens,
       CAST(floor(before / {budget}) AS BIGINT) AS seq_id,
       CAST(before % {budget} AS BIGINT) AS offset
FROM pref
"""
