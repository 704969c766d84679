"""Format readers: the SAME corpus read from parquet / json-lines /
csv / one-file-per-doc must build byte-identical indexes and answer
queries identically (the normalization layer cannot change content or
id derivation)."""

import json
import os

import pandas as pd
import pytest

from chearch_spark.build import build_index
from chearch_spark.functions.hashing import py_md5_long
from chearch_spark.plans.query import Term
from chearch_spark.search import Index
from chearch_spark.sources.readers import (
    corpus_from_csv,
    corpus_from_files,
    corpus_from_json,
    corpus_from_parquet,
)

ROWS = [
    (0, "merge sort alpha"),
    (1, "sort beta merge"),
    (2, "gamma delta"),
    (3, "merge only"),
]


@pytest.fixture(scope="module")
def sources(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("readers")
    pdf = pd.DataFrame(ROWS, columns=["doc_id", "text"])
    pq = str(base / "corpus_parquet")
    spark.createDataFrame(pdf).write.parquet(pq)
    jl = str(base / "corpus.jsonl")
    with open(jl, "w") as f:
        for i, t in ROWS:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    cv = str(base / "corpus.csv")
    pdf.to_csv(cv, index=False)
    fdir = base / "files"
    fdir.mkdir()
    for i, t in ROWS:
        (fdir / f"doc{i}.txt").write_text(t)
    return {"parquet": pq, "jsonl": jl, "csv": cv, "files": str(fdir)}


def _docset(spark, corpus, tmp):
    build_index(spark, corpus, tmp, num_segments=2, resume=False)
    ix = Index(spark, tmp)
    return {
        int(r.doc_id): None
        for r in ix.match_docs(Term("merge")).collect()
    }.keys()


def test_all_formats_answer_identically(spark, sources, tmp_path_factory):
    want = None
    for kind, maker in [
        ("parquet", lambda: corpus_from_parquet(spark, sources["parquet"])),
        (
            "jsonl",
            lambda: corpus_from_json(
                spark, sources["jsonl"], doc_id_col="doc_id"
            ),
        ),
        (
            "csv",
            lambda: corpus_from_csv(
                spark, sources["csv"], doc_id_col="doc_id"
            ),
        ),
    ]:
        out = str(tmp_path_factory.mktemp(f"rix_{kind}"))
        got = sorted(_docset(spark, maker(), out))
        if want is None:
            want = got
        assert got == want, kind
    assert want == [0, 1, 3]


def test_derived_ids_are_engine_portable(spark, sources):
    """No id column -> md5-derived id over the caller's identity
    columns, reproducible outside Spark (py_md5_long mirror)."""
    c = corpus_from_json(
        spark, sources["jsonl"], id_cols=["text"]
    ).collect()
    got = {r.doc_id for r in c}
    want = {py_md5_long(t) for _i, t in ROWS}
    assert got == want
    with pytest.raises(ValueError):
        corpus_from_json(spark, sources["jsonl"])


def test_files_source_one_doc_per_file(spark, sources, tmp_path_factory):
    c = corpus_from_files(spark, sources["files"], glob="*.txt")
    rows = {r.doc_id: r.text for r in c.collect()}
    assert len(rows) == len(ROWS)
    assert sorted(rows.values()) == sorted(t for _i, t in ROWS)
    # ids = md5-derived path hashes, stable across re-reads
    again = {r.doc_id for r in corpus_from_files(
        spark, sources["files"], glob="*.txt").collect()}
    assert again == set(rows)
    # and the corpus is buildable/queryable end-to-end
    out = str(tmp_path_factory.mktemp("rix_files"))
    build_index(spark, c, out, num_segments=2, resume=False)
    hits = Index(spark, out).match_docs(Term("merge")).count()
    assert hits == 3
