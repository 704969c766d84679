"""Percolation — reverse search (the Elasticsearch percolator): a
REGISTRY of stored queries is matched against incoming documents, the
saved-search / alerting primitive ("which subscriptions does this new
doc trigger?").

The reference engine (and this repo's forward path) inverts documents
and streams queries; the percolator inverts nothing.  Each stored
query tree compiles to ONE Catalyst boolean expression over the
document's token array (``array_contains`` per term, ``&``/``|``/
``& ~`` for the algebra, an integer clause-count for MinShould), and
all queries evaluate in a single whole-stage-codegen projection:

* zero shuffles, zero kernels — matching is a per-row predicate, so
  the plan scales as scan bandwidth at ANY corpus size;
* the query registry rides in the PLAN (expressions), the right shape
  for the realistic registry sizes of an alerting tier (hundreds to a
  few thousand saved searches); chunk registries beyond codegen
  comfort into several projections over the same scan;
* streaming percolation is the SAME projection over a readStream —
  expressions are stateless, so no watermark or state store is
  involved (`percolate_stream`).

Scoring combinators percolate as MATCH-ONLY predicates (the ES
percolator's behavior — a percolate hit reports the query matched,
not a corpus-relative score, since there is no corpus-wide df to
score against): ConstantScore/Boosting/Filter match their
inner/positive doc sets; DisMax matches its union; MinShould its
m-of-n count.  POSITIONAL leaves (Phrase/Near) compile to
exists-over-positions expressions on the same token array, capped at
the index's MAX_POSITION so reverse==forward parity extends to the
255-position data model.  Dictionary-expanding leaves
(Prefix/Fuzzy/Wildcard/Regexp) are rejected — they need an index
dictionary the percolator deliberately does not have.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chearch_spark import spec
from chearch_spark.functions.text import TOKENS_SQL, tokens_col
from chearch_spark.plans.query import (
    And,
    Boosting,
    ConstantScore,
    Diff,
    DisMax,
    Filter,
    MinShould,
    Near,
    Node,
    Or,
    Phrase,
    Synonym,
    Term,
)
from chearch_spark.search import _normalize


def _positions_of(toks: Column, word: str) -> Column:
    """0-based positions of ``word`` in the token array, capped at the
    index's MAX_POSITION (the 255-position data-model parity)."""
    idx = F.when(
        F.size(toks) > 0,
        F.sequence(
            F.lit(0), F.least(F.size(toks) - 1, F.lit(spec.MAX_POSITION))
        ),
    ).otherwise(F.array().cast("array<int>"))
    return F.filter(idx, lambda i: F.get(toks, i) == word)


def _compile(node: Node, toks: Column) -> Column:
    """Query tree -> Catalyst boolean over a token array column."""
    if isinstance(node, Term):
        return F.array_contains(toks, node.term)
    if isinstance(node, Synonym):
        out = F.array_contains(toks, node.words[0])
        for w in node.words[1:]:
            out = out | F.array_contains(toks, w)
        return out
    if isinstance(node, And):
        return _compile(node.a, toks) & _compile(node.b, toks)
    if isinstance(node, Or):
        return _compile(node.a, toks) | _compile(node.b, toks)
    if isinstance(node, Diff):
        return _compile(node.a, toks) & ~_compile(node.b, toks)
    if isinstance(node, MinShould):
        n = _compile(node.clauses[0], toks).cast("int")
        for c in node.clauses[1:]:
            n = n + _compile(c, toks).cast("int")
        return n >= node.m
    if isinstance(node, DisMax):
        out = _compile(node.clauses[0], toks)
        for c in node.clauses[1:]:
            out = out | _compile(c, toks)
        return out
    if isinstance(node, ConstantScore):
        return _compile(node.query, toks)
    if isinstance(node, Boosting):
        return _compile(node.positive, toks)
    if isinstance(node, Filter):
        return _compile(node.query, toks)
    if isinstance(node, Phrase):
        # exists a 0-based start i — capped so the LAST member's
        # position stays within the index's stored-position range
        # (MAX_POSITION), keeping reverse==forward parity with
        # match_phrase's 255-cap data model — where every member word
        # sits at its offset
        k = len(node.words)
        words = node.words
        hi = F.least(
            F.size(toks) - k, F.lit(spec.MAX_POSITION - (k - 1))
        )
        starts = F.when(hi >= 0, F.sequence(F.lit(0), hi)).otherwise(
            F.array().cast("array<int>")
        )

        def at(i):
            cond = F.get(toks, i) == words[0]
            for j in range(1, k):
                cond = cond & (F.get(toks, i + j) == words[j])
            return cond

        return F.exists(starts, at)
    if isinstance(node, Near):
        w = int(node.window)
        pa = _positions_of(toks, node.a)
        pb = _positions_of(toks, node.b)
        return F.exists(
            pa,
            lambda i: F.exists(pb, lambda j: F.abs(i - j) <= w),
        )
    raise ValueError(
        f"{type(node).__name__} cannot percolate: "
        "dictionary-expanding leaves need an index; register the "
        "expanded form instead"
    )


def compile_queries(queries: dict[str, "Node | str"]) -> dict[str, Node]:
    """Normalize a registry once at registration time (the percolator
    is register-rarely / match-often)."""
    out = {}
    for name, q in queries.items():
        if isinstance(q, str):
            from chearch_spark.plans.parser import parse_query

            q = parse_query(q)
        out[name] = _normalize(q)
    return out


def percolate(
    docs: DataFrame,
    queries: dict[str, "Node | str"],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, query) rows: which registered queries each document
    matches.  One codegen projection — tokenize once, evaluate every
    query's predicate, keep the names whose predicate held.  Docs
    matching nothing emit no rows (ES percolate hit semantics)."""
    if not queries:
        raise ValueError("percolate needs at least one registered query")
    compiled = compile_queries(queries)
    from chearch_spark.functions.parallel import spread_small_scan

    # tokenize ONCE per row: the token array is aliased in its own
    # projection and referenced by name below — expressions containing
    # lambda functions are excluded from codegen common-subexpression
    # elimination, and CollapseProject keeps a non-cheap alias that is
    # referenced many times un-inlined, so this is what stops the
    # registry from re-tokenizing the document once per term
    # (measured ~10x on a 6-query registry).  r7: spread_small_scan
    # keeps the projection from serializing on 1-2 parquet splits for
    # few-MB corpora (size-guarded — unchanged plan at scale).
    docs = spread_small_scan(docs)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("__toks"),
    )
    toks = F.col("__toks")
    hits = F.array_compact(
        F.array(
            *[
                F.when(_compile(node, toks), F.lit(name))
                for name, node in sorted(compiled.items())
            ]
        )
    )
    # explode_OUTER + a post-generate null filter, deliberately: a
    # plain explode makes the optimizer infer `size(hits) > 0` and
    # push it below the token projection, re-inlining the tokenizer
    # once per term into the filter (the HOF-CSE trap again, measured
    # ~2x); the outer form infers nothing, and the null filter runs on
    # the generated column
    return (
        base.select("doc_id", hits.alias("__hits"))
        .select("doc_id", F.explode_outer("__hits").alias("query"))
        .filter(F.col("query").isNotNull())
    )


def percolate_stream(
    stream_df: DataFrame,
    queries: dict[str, "Node | str"],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming percolation: the identical stateless projection over
    a readStream — attach any sink (alerts topic, parquet audit log).
    Same results micro-batch by micro-batch as :func:`percolate` on
    the batch union (no state, no watermark, nothing to drift)."""
    return percolate(stream_df, queries, text_col=text_col, id_col=id_col)


def _term_pred_sql(node: Node, toks_expr: str) -> str:
    """DuckDB twin of :func:`_compile` for the oracle gate."""
    if isinstance(node, Term):
        return f"list_contains({toks_expr}, '{node.term}')"
    if isinstance(node, Synonym):
        return (
            "("
            + " OR ".join(
                f"list_contains({toks_expr}, '{w}')" for w in node.words
            )
            + ")"
        )
    if isinstance(node, And):
        return (
            f"({_term_pred_sql(node.a, toks_expr)} AND "
            f"{_term_pred_sql(node.b, toks_expr)})"
        )
    if isinstance(node, Or):
        return (
            f"({_term_pred_sql(node.a, toks_expr)} OR "
            f"{_term_pred_sql(node.b, toks_expr)})"
        )
    if isinstance(node, Diff):
        return (
            f"({_term_pred_sql(node.a, toks_expr)} AND NOT "
            f"{_term_pred_sql(node.b, toks_expr)})"
        )
    if isinstance(node, MinShould):
        total = " + ".join(
            f"CAST({_term_pred_sql(c, toks_expr)} AS INT)"
            for c in node.clauses
        )
        return f"(({total}) >= {node.m})"
    if isinstance(node, DisMax):
        return (
            "("
            + " OR ".join(
                _term_pred_sql(c, toks_expr) for c in node.clauses
            )
            + ")"
        )
    if isinstance(node, ConstantScore):
        return _term_pred_sql(node.query, toks_expr)
    if isinstance(node, Boosting):
        return _term_pred_sql(node.positive, toks_expr)
    if isinstance(node, Filter):
        return _term_pred_sql(node.query, toks_expr)
    if isinstance(node, Phrase):
        # DuckDB lists are 1-based: engine 0-based start i maps to
        # i+1, so the cap MAX_POSITION-(k-1) maps to the same bound +1
        k = len(node.words)
        cap = spec.MAX_POSITION - (k - 1) + 1
        conds = " AND ".join(
            f"({toks_expr})[i + {j}] = '{w}'"
            for j, w in enumerate(node.words)
        )
        starts = (
            f"range(1, greatest(0, least(len({toks_expr}) - {k - 1}, "
            f"{cap})) + 1)"
        )
        return f"(len(list_filter({starts}, i -> {conds})) > 0)"
    if isinstance(node, Near):
        cap = spec.MAX_POSITION + 1

        def pos(word: str) -> str:
            rng = (
                f"range(1, greatest(0, least(len({toks_expr}), "
                f"{cap})) + 1)"
            )
            return (
                f"list_filter({rng}, p -> ({toks_expr})[p] = '{word}')"
            )

        return (
            f"(len(list_filter({pos(node.a)}, i -> "
            f"len(list_filter({pos(node.b)}, j -> abs(i - j) <= "
            f"{int(node.window)})) > 0)) > 0)"
        )
    raise ValueError(f"{type(node).__name__} cannot percolate")


def percolate_sql(
    queries: dict[str, "Node | str"], table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB mirror: one UNION ALL branch per registered query.
    Registry names are escaped as SQL literals (r7, ADVICE) —
    apostrophe-free names emit byte-identical SQL to before."""
    compiled = compile_queries(queries)
    toks = TOKENS_SQL.format(t=text_col)
    branches = "\nUNION ALL\n".join(
        f"""SELECT doc_id, '{name.replace("'", "''")}' AS query FROM {table}
WHERE {_term_pred_sql(node, toks)}"""
        for name, node in sorted(compiled.items())
    )
    return branches + "\n"
