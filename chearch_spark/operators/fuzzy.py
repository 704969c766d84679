"""Fuzzy term matching (edit distance <= 1) — SymSpell-style
deletion-variant candidates verified by native ``levenshtein``.

A distance-1 pair (classic Levenshtein: one substitution, insertion,
or deletion) ALWAYS shares a deletion variant with the query:

* substitution at i  -> del_i(term) == del_i(query)
* term has 1 extra   -> query is a deletion variant of term
* query has 1 extra  -> term is a deletion variant of query
* equal              -> term == query

so the candidate set {term == q} ∪ {term ∈ D(q)} ∪ {D(term) ∩
({q} ∪ D(q)) != ∅} is COMPLETE for max_edits=1 (Garbe's SymSpell
observation), and a final ``levenshtein(term, q) <= 1`` filter makes
it exact (the shared-deletion test alone also admits a few
distance-2 pairs like 'ab'/'ba').

Scale shape: with a single query term known at plan time, the
candidate test is a PURE PROJECTION over the vocabulary — the query's
deletion set D(q) (|q| tiny strings) is baked in as literals, the
term's deletion variants are one JVM ``transform``, and both filters
(``arrays_overlap`` + ``levenshtein``) are Catalyst expressions.  No
join, no shuffle, no UDF: one narrow scan of the vocabulary (or of
the index's range-partitioned dictionary parquet — `Index.fuzzy_terms`
uses the same expressions over `dictionary/`).  Both engines ship a
native classic Levenshtein, so the DuckDB mirror is the brute-force
semantic definition over the same vocabulary.

The reference has no fuzzy surface (exact term hashing only,
`genhashkey32.chpl:7-31`); this is the query-expansion layer users
expect from a search engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chearch_spark.functions.text import TOKENS_SQL, tokens_col

MAX_FUZZY_EXPANSIONS = 8


def _del_variants(s: str) -> list[str]:
    return [s[:i] + s[i + 1:] for i in range(len(s))]


def _del_variants_col(c: Column) -> Column:
    """All length-1 deletion variants of a term column, as one JVM
    ``transform`` over its character positions."""
    return F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(
            c.substr(F.lit(1), i - F.lit(1)),
            c.substr(i + F.lit(1), F.length(c)),
        ),
    )


def fuzzy_match_col(term: Column, query: str) -> Column:
    """Boolean Catalyst expression: ``levenshtein(term, query) <= 1``,
    evaluated only on deletion-variant candidates (the cheap exact
    prefilter runs first; levenshtein verifies)."""
    probe = [query] + _del_variants(query)
    candidate = term.isin(probe) | F.arrays_overlap(
        _del_variants_col(term),
        F.array(*[F.lit(p) for p in probe]),
    )
    return candidate & (F.levenshtein(term, F.lit(query)) <= 1)


def vocabulary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, df) — distinct terms with document frequency, the same
    tokenizer as the index build."""
    return (
        docs.select(
            "doc_id", F.explode(tokens_col(F.col(text_col))).alias("term")
        )
        .distinct()
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )


def fuzzy_terms(
    docs: DataFrame,
    query: str,
    max_edits: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary terms within ``max_edits`` (only 1 supported — the
    deletion-variant completeness proof is distance-1) of ``query``:
    (term, df, dist)."""
    if max_edits != 1:
        raise ValueError(
            "fuzzy_terms supports max_edits=1 (deletion-variant "
            "candidate generation is complete only for distance 1)"
        )
    q = query.lower()
    vocab = vocabulary(docs, text_col)
    return vocab.filter(fuzzy_match_col(F.col("term"), q)).select(
        "term",
        "df",
        F.levenshtein(F.col("term"), F.lit(q)).cast("int").alias("dist"),
    )


def fuzzy_terms_sql(
    query: str,
    max_edits: int = 1,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB mirror — the brute-force semantic definition (the
    candidate prefilter is a pure optimization, so the oracle skips
    it): every vocabulary term with levenshtein <= max_edits."""
    q = query.lower().replace("'", "''")
    toks = TOKENS_SQL.format(t=text_col)
    return f"""
WITH vocab AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM (SELECT doc_id, unnest({toks}) AS term FROM {table})
  WHERE term <> ''
  GROUP BY term
)
SELECT term, df,
       CAST(levenshtein(term, '{q}') AS INTEGER) AS dist
FROM vocab
WHERE levenshtein(term, '{q}') <= {max_edits}
"""
