"""Hybrid retrieval: reciprocal-rank fusion of a lexical (BM25) and a
semantic (embedding cosine) ranked list.

Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
``rrf(d) = sum over systems 1 / (k0 + rank_system(d))``.  RRF needs
only the RANKS of each input list — never their incomparable raw
scores — which makes it the standard way production search engines
(Elasticsearch, Vespa, OpenSearch) combine BM25 with vector recall.

Scale shape: both inputs are already top-``topn``-reduced *before*
fusion — the lexical side by the index's single-scan
``search_many`` (one pruned segment scan + one gather for ALL
queries), the semantic side by ``cosine_topk``'s broadcast-query /
partial-top-k plan.  The fusion itself therefore joins two tiny
(|queries| x topn)-row relations — O(q·topn) work regardless of
corpus size, no corpus shuffle, no new scan.  At 100 TB the cost is
entirely in the two upstream retrievals, which keep their audited
plans (PLANS.md).

Determinism / oracle parity: ``1.0 / (k0 + rank)`` over integer ranks
is the same double in any engine, and the two-term sum is order-safe
(binary double addition is commutative), so the fused scores are
bit-identical to the DuckDB mirror whenever the input RANK lists
match — which the existing ``bm25_*`` / ``ann_topk`` hash gates pin.
Ties (same rank pattern) break on ``doc_id`` ascending in both
engines.

The reference engine has no fusion surface (it has no vector path at
all — SURVEY.md §2.5); this extends the same scatter-gather search
API (`searchindex.chpl:86-168`) with the hybrid shape a
training-data retrieval stack needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K0 = 60  # the paper's (and Elasticsearch's) default smoothing


def rrf_fuse(
    lexical: DataFrame,
    semantic: DataFrame,
    k: int = 10,
    k0: int = RRF_K0,
) -> DataFrame:
    """Fuse two ranked lists ``(query, doc_id, rank)`` into
    ``(query, doc_id, rrf, rank)`` — top-``k`` per query by the RRF
    score, ties on doc_id ascending.

    Inputs need only the three named columns; extra columns are
    ignored.  A document missing from one list simply contributes 0
    from that list (the standard RRF convention), so the fused set is
    the UNION of both candidate lists.
    """
    contrib = F.lit(1.0) / (F.lit(k0) + F.col("rank"))
    lx = lexical.select("query", "doc_id", contrib.alias("_cl"))
    sm = semantic.select("query", "doc_id", contrib.alias("_cs"))
    fused = lx.join(sm, ["query", "doc_id"], "full_outer").select(
        "query",
        "doc_id",
        (
            F.coalesce(F.col("_cl"), F.lit(0.0))
            + F.coalesce(F.col("_cs"), F.lit(0.0))
        ).alias("_rrf"),
    )
    w = Window.partitionBy("query").orderBy(
        F.desc("_rrf"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query",
            "doc_id",
            F.round("_rrf", 6).alias("rrf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def hybrid_rrf(
    ix,
    emb: DataFrame,
    pairs: dict[str, tuple],
    k: int = 10,
    k0: int = RRF_K0,
    topn: int = 10,
) -> DataFrame:
    """Hybrid search over an :class:`~chearch_spark.search.Index` and
    an embedding table: ``pairs`` maps query name -> (lexical query
    Node/str, semantic query vec_id).

    ALL lexical queries run in ONE Spark job (``search_many``'s
    single pruned scan); all semantic queries share one broadcast
    cosine pass; the fused result is top-``k`` per name.
    """
    lex = ix.search_many(
        {name: node for name, (node, _vid) in pairs.items()}, k=topn
    ).select("query", "doc_id", "rank")

    from chearch_spark.operators.ann import cosine_topk

    vid_of = {name: int(vid) for name, (_n, vid) in pairs.items()}
    sem_raw = cosine_topk(emb, sorted(set(vid_of.values())), k=topn)
    # vec query id -> query name via a broadcast join against the
    # query-set-sized mapping (ONE cosine pass even when names share a
    # vec_id; a per-name union would re-scan the corpus per branch)
    spark = emb.sparkSession
    mapping = spark.createDataFrame(
        [(vid, name) for name, vid in sorted(vid_of.items())],
        "query_id long, query string",
    )
    sem = sem_raw.join(F.broadcast(mapping), "query_id").select(
        "query", F.col("vec_id").alias("doc_id"), "rank"
    )
    return rrf_fuse(lex, sem, k=k, k0=k0)
