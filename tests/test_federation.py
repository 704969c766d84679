"""Federated multi-index search (chearch_spark/federation.py): the ES
dfs_query_then_fetch semantics — N member indexes answer as ONE corpus,
rank- and score-identical (bit-exact) to a single index built over the
concatenated documents, at any member layout."""

import os

import pandas as pd
import pytest

from chearch_spark.build import build_index
from chearch_spark.federation import MultiIndex
from chearch_spark.plans.query import (
    And,
    Boosting,
    DisMax,
    Fuzzy,
    MinShould,
    Or,
    Phrase,
    Prefix,
    Synonym,
    Term,
    Wildcard,
)
from chearch_spark.search import Index

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

QUERIES = {
    "term": Term("batch"),
    "hot": Term("the"),
    "and": Term("merge") & Term("sort"),
    "nested": (Term("merge") & Term("sort")) | Term("dup"),
    "boost": Term("merge", 2.5) | Term("dup"),
    "synonym": Synonym(("merge", "dup")),
    "msm": MinShould((Term("batch"), Term("dup"), Term("merge")), 2),
    "dismax": DisMax((And(Term("merge"), Term("sort")), Term("dup")), 0.3),
    "boosting": Boosting(Or(Term("batch"), Term("join")), Term("dup"), 0.4),
    "prefix": Prefix("mer"),
    "fuzzy": Fuzzy("merg"),
    "wildcard": Wildcard("s?rt"),
    "phrase": Phrase(("merge", "sort")),
    "missing": Term("zz_missing_zz"),
    "string": "merge OR dup",
}


@pytest.fixture(scope="module")
def corpus_pdf():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]


@pytest.fixture(scope="module")
def fed_and_merged(spark, corpus_pdf, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fed"))
    halves = {
        "a": corpus_pdf[corpus_pdf.doc_id % 2 == 0],
        "b": corpus_pdf[corpus_pdf.doc_id % 2 == 1],
        "all": corpus_pdf,
    }
    for name, part in halves.items():
        build_index(
            spark,
            spark.createDataFrame(part),
            f"{root}/{name}",
            num_segments=4 if name == "all" else 3,
        )
    fed = MultiIndex(spark, [f"{root}/a", f"{root}/b"])
    merged = Index(spark, f"{root}/all")
    return fed, merged


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_combined_stats_bit_equal(fed_and_merged):
    fed, merged = fed_and_merged
    assert fed.n_docs == merged.n_docs
    assert fed.avgdl == merged.avgdl  # exact int totals, one division


@pytest.mark.parametrize("qname", sorted(QUERIES))
def test_federated_search_equals_merged_build(fed_and_merged, qname):
    """BIT-exact rank + score parity vs the merged single index, per
    query family — including per-member multi-term expansion and the
    scoring combinators."""
    fed, merged = fed_and_merged
    q = QUERIES[qname]
    assert _rows(fed.search(q, k=10)) == _rows(merged.search(q, k=10))


def test_federated_match_docs_and_count(fed_and_merged):
    fed, merged = fed_and_merged
    for q in (QUERIES["nested"], QUERIES["phrase"], QUERIES["missing"]):
        assert sorted(
            r.doc_id for r in fed.match_docs(q).collect()
        ) == sorted(r.doc_id for r in merged.match_docs(q).collect())
        assert fed.count(q) == merged.count(q)


def test_single_member_equals_plain_index(spark, fed_and_merged):
    """A 1-member federation is the plain index (stats reduce to its
    own; the union is a no-op)."""
    fed, merged = fed_and_merged
    solo = MultiIndex(spark, [merged])
    q = QUERIES["nested"]
    assert _rows(solo.search(q, k=10)) == _rows(merged.search(q, k=10))


def test_empty_member_is_transparent(spark, corpus_pdf, fed_and_merged, tmp_path_factory):
    """An empty member contributes nothing and breaks nothing — the
    fleet pattern where today's index has no documents yet."""
    fed, merged = fed_and_merged
    out = str(tmp_path_factory.mktemp("fed_empty"))
    build_index(
        spark,
        spark.createDataFrame([], "doc_id long, text string"),
        out,
        num_segments=2,
    )
    fed2 = MultiIndex(spark, [*fed.indexes, out])
    q = QUERIES["nested"]
    assert _rows(fed2.search(q, k=10)) == _rows(merged.search(q, k=10))


def test_federated_deletes_propagate(spark, corpus_pdf, tmp_path_factory):
    """Member tombstones are honored: deleting ids in a MEMBER equals
    deleting them in the merged index (scores keep the pinned
    stale-stats semantics on both sides until compaction)."""
    root = str(tmp_path_factory.mktemp("fed_del"))
    a = corpus_pdf[corpus_pdf.doc_id % 2 == 0]
    b = corpus_pdf[corpus_pdf.doc_id % 2 == 1]
    for name, part in (("a", a), ("b", b), ("all", corpus_pdf)):
        build_index(
            spark, spark.createDataFrame(part), f"{root}/{name}",
            num_segments=3,
        )
    merged = Index(spark, f"{root}/all")
    ixa = Index(spark, f"{root}/a")
    victim_rows = (
        merged.search(Term("merge") | Term("dup"), k=3).collect()
    )
    victims = [
        int(r.doc_id) for r in victim_rows if int(r.doc_id) % 2 == 0
    ]
    if not victims:  # corpus draw put no even ids in the top 3
        victims = [int(a.doc_id.iloc[0])]
    ixa.delete(victims)
    merged.delete(victims)
    fed = MultiIndex(spark, [ixa, Index(spark, f"{root}/b")])
    got = _rows(fed.search(Term("merge") | Term("dup"), k=10))
    want = _rows(merged.search(Term("merge") | Term("dup"), k=10))
    assert got == want
    assert not (set(victims) & {d for d, _ in got})


def test_federated_plan_shape(fed_and_merged):
    """The federated plan keeps each member's pruned scan (term IN
    pushed to parquet per member) and gathers once: a single
    TakeOrderedAndProject, no join, no corpus-sized exchange."""
    fed, _ = fed_and_merged
    df = fed.search(QUERIES["nested"], k=10)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("PushedFilters: [In(term") == len(fed.indexes)
    # formatted mode names each operator twice (tree row + detail
    # header); the tree row carries a trailing " (" + plan id
    assert plan.count("TakeOrderedAndProject (") == 1
    assert "+- Union" in plan
    assert "Join" not in plan


def test_federated_search_many_equals_merged(fed_and_merged):
    """Batch federation (ES msearch over an alias): per-query results
    identical to the merged index's search_many — one scan per member,
    one window over the union."""
    fed, merged = fed_and_merged
    batch = {
        "nested": QUERIES["nested"],
        "boost": QUERIES["boost"],
        "msm": QUERIES["msm"],
        "prefix": QUERIES["prefix"],
    }
    got = fed.search_many(batch, k=10).collect()
    want = merged.search_many(batch, k=10).collect()
    assert sorted(
        [(r.query, r.rank, r.doc_id, r.score) for r in got],
        key=lambda t: t[:2],
    ) == sorted(
        [(r.query, r.rank, r.doc_id, r.score) for r in want],
        key=lambda t: t[:2],
    )


def test_hot_cold_federation(spark, corpus_pdf, tmp_path_factory):
    """The lambda-serving shape: a COLD batch-built member + a HOT
    stream-ingested member federate into exactly the merged corpus —
    queries over the alias see freshly streamed docs with correct
    combined statistics."""
    from chearch_spark.streaming.ingest import finalize_index, ingest_batch

    root = str(tmp_path_factory.mktemp("fed_hotcold"))
    cold_pdf = corpus_pdf[corpus_pdf.doc_id % 3 != 0]
    hot_pdf = corpus_pdf[corpus_pdf.doc_id % 3 == 0]
    build_index(
        spark, spark.createDataFrame(cold_pdf), f"{root}/cold",
        num_segments=3,
    )
    hot = spark.createDataFrame(hot_pdf)
    for b in range(2):
        ingest_batch(
            hot.filter(f"pmod(doc_id, 2) = {b}"), f"{root}/hot",
            batch_id=b, num_segments=2,
        )
    finalize_index(spark, f"{root}/hot")
    build_index(
        spark, spark.createDataFrame(corpus_pdf), f"{root}/all",
        num_segments=4,
    )
    fed = MultiIndex(spark, [f"{root}/cold", f"{root}/hot"])
    merged = Index(spark, f"{root}/all")
    for q in (QUERIES["nested"], QUERIES["msm"], QUERIES["phrase"]):
        assert _rows(fed.search(q, k=10)) == _rows(merged.search(q, k=10))


def test_federated_facets_equal_merged(spark, fed_and_merged):
    """Aggregations over the alias: facet counts/stats/cardinality of
    the federated match set equal the merged index's."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fed, merged = fed_and_merged
    q = QUERIES["nested"]

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(fed.facet_counts(q, docs, ["lang", "source"])) == rows(
        merged.facet_counts(q, docs, ["lang", "source"])
    )
    assert rows(
        fed.facet_stats(q, docs, ["lang"], "n_chars")
    ) == rows(merged.facet_stats(q, docs, ["lang"], "n_chars"))
    assert rows(
        fed.facet_cardinality(q, docs, ["lang"], "n_chars")
    ) == rows(merged.facet_cardinality(q, docs, ["lang"], "n_chars"))
    assert rows(
        fed.facet_range(q, docs, "n_chars", 0, 100)
    ) == rows(merged.facet_range(q, docs, "n_chars", 0, 100))
    assert rows(
        fed.facet_percentiles(q, docs, ["lang"], "n_chars", (0.5,))
    ) == rows(
        merged.facet_percentiles(q, docs, ["lang"], "n_chars", (0.5,))
    )
