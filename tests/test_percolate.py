"""Percolation (operators/percolate.py): reverse search — stored
queries matched against documents in one codegen projection.  The
killer invariant: percolate hits for a query == the forward index's
match_docs doc set for the same query (reverse search IS search)."""

import os

import pandas as pd
import pytest

from chearch_spark.build import build_index
from chearch_spark.operators.percolate import (
    percolate,
    percolate_sql,
    percolate_stream,
)
from chearch_spark.plans.query import (
    Boosting,
    ConstantScore,
    Diff,
    DisMax,
    MinShould,
    Near,
    Phrase,
    Prefix,
    Synonym,
    Term,
    bool_query,
)
from chearch_spark.search import Index

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

REGISTRY = {
    "a_and": Term("merge") & Term("sort"),
    "a_term": Term("dup"),
    "a_diff": Diff(Term("batch"), Term("the")),
    "a_msm": MinShould((Term("merge"), Term("sort"), Term("dup")), 2),
    "a_syn": Synonym(("merge", "join")),
    "a_dismax": DisMax((Term("batch"), Term("dup")), 0.3),
    "a_const": ConstantScore(Term("sort"), 2.0),
    "a_boosting": Boosting(Term("batch"), Term("dup"), 0.5),
    "a_string": "batch AND (dup OR sort)",
    "a_fold": Term("merge-sort"),  # normalizes to the AND of both
    "a_phrase": Phrase(("merge", "sort")),
    "a_near": Near("merge", "sort", 3),
    "a_bool": bool_query(
        must=[Term("merge")], filter_=[Term("sort")], should=[Term("dup")]
    ),
}


@pytest.fixture(scope="module")
def corpus_pdf():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]


@pytest.fixture(scope="module")
def docs(spark, corpus_pdf):
    return spark.createDataFrame(corpus_pdf)


@pytest.fixture(scope="module")
def hits_by_query(spark, docs):
    out = {}
    for r in percolate(docs, REGISTRY).collect():
        out.setdefault(r.query, set()).add(r.doc_id)
    return out


def test_percolate_equals_forward_search(
    spark, corpus_pdf, hits_by_query, tmp_path_factory
):
    """Reverse search == forward search: for every registered query,
    the percolate hit set equals match_docs on an index over the same
    corpus (non-positional algebra is docset-equivalent by design)."""
    out = str(tmp_path_factory.mktemp("perc_ix"))
    build_index(spark, spark.createDataFrame(corpus_pdf), out, num_segments=4)
    ix = Index(spark, out)
    for name, q in REGISTRY.items():
        want = {r.doc_id for r in ix.match_docs(q).collect()}
        assert hits_by_query.get(name, set()) == want, name


def test_percolate_matches_duckdb(corpus_pdf, hits_by_query):
    import duckdb

    con = duckdb.connect()
    con.register("documents", corpus_pdf)
    want = {}
    for doc_id, q in con.sql(percolate_sql(REGISTRY)).fetchall():
        want.setdefault(q, set()).add(doc_id)
    assert hits_by_query == want


def test_percolate_validation(docs):
    with pytest.raises(ValueError, match="at least one"):
        percolate(docs, {})
    with pytest.raises(ValueError, match="cannot percolate"):
        percolate(docs, {"p": Prefix("mer")}).collect()


def test_percolate_plan_no_shuffle(docs):
    # r7: the size-guarded spread_small_scan may add ONE round-robin
    # exchange on few-MB inputs (parallelizing the tokenize stage); any
    # KEYED shuffle is still a bug, and at scale the spread is a no-op
    df = percolate(docs, {"q": Term("merge") & Term("sort")})
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert "FlatMapGroupsInPandas" not in plan  # no kernel, pure codegen


def test_percolate_stream_equals_batch(
    spark, corpus_pdf, hits_by_query, tmp_path
):
    """Streaming percolation over a file stream (availableNow) emits
    exactly the batch hits — the projection is stateless."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    half = len(corpus_pdf) // 2
    corpus_pdf.iloc[:half].to_parquet(f"{src}/part-0.parquet")
    corpus_pdf.iloc[half:].to_parquet(f"{src}/part-1.parquet")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        percolate_stream(stream, REGISTRY)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {}
    for r in spark.read.parquet(sink).collect():
        got.setdefault(r.query, set()).add(r.doc_id)
    assert got == hits_by_query


def test_percolate_positional_position_cap(spark):
    """Positional percolation honors the index's 255-position cap: a
    phrase starting past MAX_POSITION is NOT a hit (match_phrase
    cannot see it either — reverse==forward extends to the cap)."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["merge sort early", "pad " * 300 + "merge sort"],
        }
    )
    docs = spark.createDataFrame(pdf)
    got = {
        r.doc_id
        for r in percolate(
            docs, {"ph": Phrase(("merge", "sort"))}
        ).collect()
    }
    assert got == {1}
