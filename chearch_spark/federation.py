"""Federated search over several independent indexes — the ES
multi-index / index-alias surface, with EXACT combined statistics.

Elasticsearch's default ``query_then_fetch`` scores each shard against
its LOCAL term statistics, so ranks drift with the shard layout; the
accurate mode, ``dfs_query_then_fetch``, first gathers global term
stats and scores every shard against them.  :class:`MultiIndex`
implements the accurate mode exactly:

* document frequencies SUM across member dictionaries (each member's
  O(1)-file driver probe, no Spark job);
* ``avgdl`` recombines from the stored exact integer token totals with
  the same float expression a merged build uses (`build.py:814-815`),
  so it is bit-identical to building one index over the concatenation;
* every member's scoring kernel receives the SAME (idf, avgdl) view
  via the ``stats_override`` seam of ``Index._scored_local``.

Result: federated top-k is rank- AND score-identical to a single
index built over the union of the corpora (pinned by
``tests/test_federation.py`` and the ``federated_topk`` DuckDB gate).

Scale shape (100 TB): each member keeps its own term-pruned parquet
scan (``PushedFilters: [In(term, ...)]`` against its own files) and
per-segment local top-k kernel; the union is plan-level (no shuffle),
and the single global gather is one TakeOrderedAndProject over at
most k rows per member segment.  Nothing corpus-sized moves.  Members
can live in different storage roots — the federation is how a fleet
of per-tenant / per-day indexes answers one query without reindexing.

Multi-term expansion (Prefix/Fuzzy/Wildcard/Regexp leaves) happens
per member against its OWN dictionary — Lucene's per-leaf-reader
rewrite.  A member without any completion contributes no docs, which
is exactly what the merged index would return for its documents; the
idf of every expanded term still comes from the COMBINED df.
"""

from __future__ import annotations

from functools import reduce

from chearch_spark import spec
from chearch_spark.plans.query import (
    Node,
    scoring_weights,
    synonym_leaves,
)
from chearch_spark.search import Index, _normalize


class MultiIndex:
    """Query N independent indexes as one corpus.

    ``members`` — :class:`Index` instances or index paths.  Stats are
    snapshotted at construction; call :meth:`refresh` after a member
    ingests or deletes."""

    def __init__(self, spark, members) -> None:
        if not members:
            raise ValueError("MultiIndex needs at least one member index")
        self.spark = spark
        self.indexes = [
            m if isinstance(m, Index) else Index(spark, m) for m in members
        ]
        self._recompute_stats()

    def _recompute_stats(self) -> None:
        self.n_docs = sum(ix.n_docs for ix in self.indexes)
        total_tokens = sum(
            int(ix.stats["total_tokens"]) for ix in self.indexes
        )
        # identical float path to a merged build's stats (exact int
        # sum, ONE division) — avgdl is bit-equal to single-index
        self.avgdl = (total_tokens / self.n_docs) if self.n_docs else 0.0

    def refresh(self) -> None:
        """Re-read every member's manifests and recombine stats."""
        for ix in self.indexes:
            ix.refresh()
        self._recompute_stats()

    # -- combined statistics ----------------------------------------------
    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """{term: (df, cf)} summed across members — the merged-corpus
        document/collection frequencies."""
        out: dict[str, tuple[int, int]] = {}
        for ix in self.indexes:
            for t, (df, cf) in ix.term_stats(terms).items():
                d, c = out.get(t, (0, 0))
                out[t] = (d + int(df), c + int(cf))
        return out

    def _combined_idfs(
        self, node: Node, stats: dict[str, tuple[int, int]]
    ) -> dict[str, float]:
        """Weighted idf view over the COMBINED stats — the federation
        twin of ``Index._weighted_idfs`` + ``_synonym_idfs``."""
        base = {
            t: spec.idf(self.n_docs, s[0]) for t, s in stats.items() if s[0]
        }
        w = scoring_weights(node)
        out = {t: v * w.get(t, 1.0) for t, v in base.items()}
        for leaf in synonym_leaves(node):
            dfs = [stats[t][0] for t in leaf.words if t in stats]
            if dfs:
                out[leaf.key()] = spec.idf(self.n_docs, max(dfs))
        return out

    def _prep_shared(self, query: Node | str) -> Node:
        if isinstance(query, str):
            from chearch_spark.plans.parser import parse_query

            query = parse_query(query)
        return _normalize(query)

    # -- retrieval ----------------------------------------------------------
    def search(self, query: Node | str, k: int = spec.DEFAULT_K):
        """Federated top-k (doc_id long, score double): rank- and
        score-identical to a single index built over the concatenated
        corpora, at any member layout."""
        from pyspark.sql import functions as F

        shared = self._prep_shared(query)
        nodes = [ix._expand(shared) for ix in self.indexes]
        union_terms = sorted({t for n in nodes for t in n.terms()})
        stats = self.term_stats(union_terms)
        locals_ = [
            ix._scored_local(
                n,
                k,
                stats_override=(self._combined_idfs(n, stats), self.avgdl),
            )
            for ix, n in zip(self.indexes, nodes)
        ]
        union = reduce(lambda a, b: a.unionByName(b), locals_)
        return union.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search_many(self, queries: dict, k: int = spec.DEFAULT_K):
        """Federated batch retrieval (ES msearch over an alias): MANY
        queries against MANY members in ONE job — each member runs its
        single union-term-pruned scan + one kernel scoring every query
        (the search_many shape), all members score against the
        COMBINED stats, and one window takes the per-query top-k over
        the union.  Per-query results identical to federated
        :meth:`search` and to a merged single index's search_many.

        Returns (query string, doc_id long, score double, rank int)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        shared = {
            name: self._prep_shared(q) for name, q in queries.items()
        }
        # per-member expansion of each query against its own dictionary
        nodes_by_member = [
            {name: ix._expand(n) for name, n in shared.items()}
            for ix in self.indexes
        ]
        union_terms = sorted(
            {
                t
                for nodes in nodes_by_member
                for n in nodes.values()
                for t in n.terms()
            }
        )
        stats = self.term_stats(union_terms)
        locals_ = [
            ix._local_many(
                nodes,
                k,
                stats_override=(
                    {
                        name: self._combined_idfs(n, stats)
                        for name, n in nodes.items()
                    },
                    self.avgdl,
                ),
            )
            for ix, nodes in zip(self.indexes, nodes_by_member)
        ]
        local = reduce(lambda a, b: a.unionByName(b), locals_)
        w = Window.partitionBy("query").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            local.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query", "doc_id", "score", F.col("rank").cast("int")
            )
            .orderBy("query", "rank")
        )

    # -- aggregations over the alias ----------------------------------------
    def _facet_matched(self, query, meta, id_col, broadcast_threshold):
        """Federated front half of the facet family: the UNION of the
        members' match-doc sets semi-joins the metadata relation once,
        with the explicit broadcast decision driven by the SUM of the
        members' dictionary-df upper bounds (a true bound on the
        federated match count)."""
        from chearch_spark.search import _facet_semi_join

        shared = self._prep_shared(query)
        nodes = [ix._expand(shared) for ix in self.indexes]
        ids = reduce(
            lambda a, b: a.unionByName(b),
            [
                ix.match_docs(n)
                for ix, n in zip(self.indexes, nodes)
            ],
        )
        bound = sum(
            ix._match_upper_bound(n)
            for ix, n in zip(self.indexes, nodes)
        )
        return _facet_semi_join(meta, ids, bound, id_col, broadcast_threshold)

    def facet_counts(
        self, query, meta, cols, id_col="doc_id", broadcast_threshold=None
    ):
        """Faceted search over the alias (same output as the members'
        merged corpus): one federated semi-join + one melted groupBy."""
        from chearch_spark.search import _facet_count_agg

        return _facet_count_agg(
            self._facet_matched(query, meta, id_col, broadcast_threshold),
            cols,
        )

    def facet_stats(
        self,
        query,
        meta,
        cols,
        val_col,
        id_col="doc_id",
        broadcast_threshold=None,
    ):
        from chearch_spark.search import _facet_stats_agg

        return _facet_stats_agg(
            self._facet_matched(query, meta, id_col, broadcast_threshold),
            cols,
            val_col,
        )

    def facet_cardinality(
        self,
        query,
        meta,
        cols,
        val_col,
        id_col="doc_id",
        broadcast_threshold=None,
        approx: bool = False,
        rsd: float = 0.05,
    ):
        from chearch_spark.search import _facet_cardinality_agg

        return _facet_cardinality_agg(
            self._facet_matched(query, meta, id_col, broadcast_threshold),
            cols,
            val_col,
            approx,
            rsd,
        )

    def facet_range(
        self,
        query,
        meta,
        val_col,
        start: int,
        width: int,
        id_col="doc_id",
        broadcast_threshold=None,
    ):
        from chearch_spark.search import _facet_range_agg

        start, width = int(start), int(width)
        if width <= 0:
            raise ValueError(f"facet_range width must be > 0, got {width}")
        return _facet_range_agg(
            self._facet_matched(query, meta, id_col, broadcast_threshold),
            val_col,
            start,
            width,
        )

    def facet_percentiles(
        self,
        query,
        meta,
        cols,
        val_col,
        pcts: tuple = (0.25, 0.5, 0.75),
        id_col="doc_id",
        broadcast_threshold=None,
        approx: bool = False,
        accuracy: int = 10000,
    ):
        from chearch_spark.search import _facet_percentiles_agg

        ps = [float(p) for p in pcts]
        if not ps or not all(0.0 <= p <= 1.0 for p in ps):
            raise ValueError(f"percentiles must be in [0, 1], got {pcts!r}")
        return _facet_percentiles_agg(
            self._facet_matched(query, meta, id_col, broadcast_threshold),
            cols,
            ps,
            val_col,
            approx,
            accuracy,
        )

    def match_docs(self, query: Node | str):
        """All matching doc ids across members (boolean retrieval,
        union-all: a doc id present in two members — a re-ingest —
        emits per member, exactly like the merged index's duplicate)."""
        dfs = [ix.match_docs(query) for ix in self.indexes]
        return reduce(lambda a, b: a.unionByName(b), dfs)

    def count(self, query: Node | str) -> int:
        """Exact federated hit count (ES ``_count`` over an alias)."""
        return sum(ix.count(query) for ix in self.indexes)
