"""Driver contract for the spark-graft builder (PySpark target).

Every entry runs the REAL engine (build parquet segments once per
(process, sf_dir), then query) — not a SQL re-expression.  The
`oracle_sql()` strings re-express the pinned spec (FIXTURES.md F4) in
DuckDB SQL over the same `documents` parquet so the driver can verify
row-count + schema + value-hash per query.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_INDEX_CACHE: dict[str, object] = {}

# BM25 constants inlined into SQL (spec.BM25_K1/BM25_B)
_K1, _B = 1.2, 0.75

_BASE_CTE = """
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM tok WHERE term <> '' GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, count(*) AS dl
  FROM tok WHERE term <> '' GROUP BY doc_id
), stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS BIGINT) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
), dfs AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
)
"""


def _sql_terms(terms: list[str]) -> str:
    return ", ".join("'" + t + "'" for t in terms)


def _bm25_sql(terms: list[str], require: str) -> str:
    """Top-10 BM25 in DuckDB SQL; `require` filters the doc set (e.g.
    'has_merge AND has_sort' for conjunctions) over per-term flags."""
    flags = ",\n         ".join(
        f"max(CASE WHEN tf.term = '{t}' THEN 1 ELSE 0 END) AS has_{t}"
        for t in terms
    )
    return f"""{_BASE_CTE}
, matched AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
              * tf.tf * ({_K1} + 1)
              / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / s.avgdl)) ) AS score,
         {flags}
  FROM tf
  JOIN dfs d ON d.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE tf.term IN ({_sql_terms(terms)})
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM matched
WHERE {require}
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""


def _docset_sql(terms: list[str], require: str) -> str:
    flags = ",\n         ".join(
        f"max(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS has_{t}"
        for t in terms
    )
    return f"""{_BASE_CTE}
, flags AS (
  SELECT doc_id, {flags}
  FROM tf WHERE term IN ({_sql_terms(terms)}) GROUP BY doc_id
)
SELECT doc_id FROM flags WHERE {require}
"""


def _get_index(spark: SparkSession, sf_dir: str):
    from chearch_spark.build import build_index
    from chearch_spark.search import Index

    key = os.path.abspath(sf_dir)
    if key not in _INDEX_CACHE:
        out = os.path.join(
            tempfile.gettempdir(),
            "chearch_entry_ix_" + key.strip("/").replace("/", "_"),
        )
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        build_index(
            spark,
            docs.select("doc_id", "text"),
            out,
            num_segments=8,
            resume=False,
        )
        _INDEX_CACHE[key] = Index(spark, out)
    return _INDEX_CACHE[key]


def _search(spark, sf_dir, node, k=10):
    from pyspark.sql import functions as F

    ix = _get_index(spark, sf_dir)
    return ix.search(node, k=k).select(
        "doc_id", F.round("score", 6).alias("score")
    )


def _match(spark, sf_dir, node):
    return _get_index(spark, sf_dir).match_docs(node)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: nested boolean BM25 top-k on sf0.001."""
    from chearch_spark.plans.query import Term

    return _search(
        spark,
        "/root/testdata/sf0.001",
        (Term("merge") & Term("sort")) | Term("dup"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pyspark.sql import functions as F

    from chearch_spark.plans.query import Term

    def term_lookup(spark, sf):
        return _match(spark, sf, Term("merge"))

    def bool_and(spark, sf):
        return _match(spark, sf, Term("merge") & Term("sort"))

    def bool_or(spark, sf):
        return _match(spark, sf, Term("merge") | Term("dup"))

    def bool_nested(spark, sf):
        return _match(spark, sf, (Term("merge") & Term("sort")) | Term("dup"))

    def term_lookup_missing(spark, sf):
        return _match(spark, sf, Term("zz_missing_zz"))

    def term_stats(spark, sf):
        ix = _get_index(spark, sf)
        return ix.dictionary().select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
        )

    def corpus_stats(spark, sf):
        ix = _get_index(spark, sf)
        return spark.createDataFrame(
            [(ix.n_docs, int(ix.stats["total_tokens"]), round(ix.avgdl, 6))],
            "n_docs long, total_tokens long, avgdl double",
        )

    def bm25_topk_and(spark, sf):
        return _search(spark, sf, Term("merge") & Term("sort"))

    def bm25_topk_or(spark, sf):
        return _search(spark, sf, Term("merge") | Term("sort") | Term("dup"))

    def bm25_topk_nested(spark, sf):
        return _search(spark, sf, (Term("merge") & Term("sort")) | Term("dup"))

    def bm25_topk_single(spark, sf):
        return _search(spark, sf, Term("dup"))

    def bm25_missing(spark, sf):
        return _search(spark, sf, Term("zz_missing_zz"))

    return {
        "term_lookup": term_lookup,
        "term_lookup_missing": term_lookup_missing,
        "bool_and": bool_and,
        "bool_or": bool_or,
        "bool_nested": bool_nested,
        "term_stats": term_stats,
        "corpus_stats": corpus_stats,
        "bm25_topk_single": bm25_topk_single,
        "bm25_topk_and": bm25_topk_and,
        "bm25_topk_or": bm25_topk_or,
        "bm25_topk_nested": bm25_topk_nested,
        "bm25_missing": bm25_missing,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "term_lookup": _docset_sql(["merge"], "has_merge = 1"),
        "term_lookup_missing": _docset_sql(
            ["zz_missing_zz"], "has_zz_missing_zz = 1"
        ),
        "bool_and": _docset_sql(
            ["merge", "sort"], "has_merge = 1 AND has_sort = 1"
        ),
        "bool_or": _docset_sql(
            ["merge", "dup"], "has_merge = 1 OR has_dup = 1"
        ),
        "bool_nested": _docset_sql(
            ["merge", "sort", "dup"],
            "(has_merge = 1 AND has_sort = 1) OR has_dup = 1",
        ),
        "term_stats": _BASE_CTE
        + """
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
FROM tf GROUP BY term
""",
        "corpus_stats": _BASE_CTE
        + """
SELECT (SELECT count(*) FROM documents) AS n_docs,
       (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS total_tokens,
       round((SELECT CAST(sum(dl) AS BIGINT) FROM dl) * 1.0
             / (SELECT count(*) FROM documents), 6) AS avgdl
""",
        "bm25_topk_single": _bm25_sql(["dup"], "has_dup = 1"),
        "bm25_topk_and": _bm25_sql(
            ["merge", "sort"], "has_merge = 1 AND has_sort = 1"
        ),
        "bm25_topk_or": _bm25_sql(
            ["merge", "sort", "dup"],
            "has_merge = 1 OR has_sort = 1 OR has_dup = 1",
        ),
        "bm25_topk_nested": _bm25_sql(
            ["merge", "sort", "dup"],
            "(has_merge = 1 AND has_sort = 1) OR has_dup = 1",
        ),
        "bm25_missing": _bm25_sql(["zz_missing_zz"], "has_zz_missing_zz = 1"),
    }
