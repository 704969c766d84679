"""chearch_spark — PySpark-native inverted-index + BM25 engine.

Top-level surface (a chearch user's entry points):

    from chearch_spark import build_index, Index, Term

    build_index(spark, corpus_df, "/path/ix", num_segments=...)
    ix = Index(spark, "/path/ix")
    ix.search((Term("merge") & Term("sort")) | Term("dup"), k=10)  # BM25
    ix.match_docs(Term("merge"))          # boolean doc sets
    ix.local_search(Term("dup"))          # driver-RAM path, ms latency

Streaming ingest/compaction lives in :mod:`chearch_spark.streaming`,
the training-data pipeline operators (dedup / ANN / text / multimodal)
in :mod:`chearch_spark.operators` and :mod:`chearch_spark.functions`,
and the reference-wire-compatible TCP server in
:mod:`chearch_spark.serving`.
"""

from chearch_spark.build import build_index
from chearch_spark.plans.parser import parse_query
from chearch_spark.plans.query import (
    And,
    Boosting,
    ConstantScore,
    Diff,
    DisMax,
    Filter,
    Fuzzy,
    MinShould,
    Near,
    Node,
    Or,
    Phrase,
    PhrasePrefix,
    Prefix,
    Regexp,
    Synonym,
    Term,
    Wildcard,
    bool_query,
)
from chearch_spark.search import Index

__all__ = [
    "And",
    "Boosting",
    "ConstantScore",
    "Diff",
    "DisMax",
    "Filter",
    "Fuzzy",
    "Index",
    "MinShould",
    "Near",
    "Node",
    "Or",
    "Phrase",
    "PhrasePrefix",
    "Prefix",
    "Regexp",
    "Synonym",
    "Term",
    "Wildcard",
    "bool_query",
    "build_index",
    "parse_query",
]
