"""Format readers: every supported input normalizes to the engine's
canonical build input ``(doc_id: long, text: string)``.

The reference has no I/O layer at all (callers hand it integer term
ids in memory; `README.md:41-67`); here the source surface is ordinary
Spark readers — schema-on-read, predicate/column pushdown where the
format supports it — plus the id-derivation rule: when the source has
no numeric id, ``doc_id`` is the engine-portable md5-derived hash of
the caller-chosen identity columns (same rule as
:func:`chearch_spark.sources.corpus.corpus_from_code`), so ids are
stable across re-reads and engines.

Scale notes: parquet/json/csv readers split by file/row-group and push
projection; ``corpus_from_files`` uses the ``binaryFile`` source (one
doc per FILE — the 10^12-files regime of the north rule), which
parallelizes over files and never concatenates on the driver.  Pass
``pathGlobFilter``/``recursiveFileLookup`` options through for
pruning; keep ``spark.sql.files.maxPartitionBytes`` sized to batch
many small files per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chearch_spark.functions.hashing import md5_long


def _normalize(
    df: DataFrame, doc_id_col: str | None, text_col: str, id_cols
) -> DataFrame:
    """Pick/derive (doc_id, text): explicit numeric id column wins;
    otherwise md5-derived hash of ``id_cols`` (order-sensitive,
    US-separator-joined so column boundaries cannot collide)."""
    if doc_id_col is not None:
        did = F.col(doc_id_col).cast("long")
    else:
        if not id_cols:
            raise ValueError(
                "either doc_id_col or id_cols is required to derive "
                "a stable doc_id"
            )
        did = md5_long(F.concat_ws("\x1f", *[F.col(c) for c in id_cols]))
    return df.select(
        did.alias("doc_id"), F.col(text_col).cast("string").alias("text")
    )


def corpus_from_parquet(
    spark,
    path: str,
    text_col: str = "text",
    doc_id_col: str | None = "doc_id",
    id_cols=(),
) -> DataFrame:
    return _normalize(
        spark.read.parquet(path), doc_id_col, text_col, id_cols
    )


def corpus_from_json(
    spark,
    path: str,
    text_col: str = "text",
    doc_id_col: str | None = None,
    id_cols=(),
    multiline: bool = False,
) -> DataFrame:
    """JSON-lines (default) or multiline JSON documents."""
    reader = spark.read
    if multiline:
        reader = reader.option("multiLine", "true")
    return _normalize(reader.json(path), doc_id_col, text_col, id_cols)


def corpus_from_csv(
    spark,
    path: str,
    text_col: str = "text",
    doc_id_col: str | None = None,
    id_cols=(),
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    return _normalize(
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .csv(path),
        doc_id_col,
        text_col,
        id_cols,
    )


def corpus_from_files(
    spark,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
    encoding: str = "UTF-8",
) -> DataFrame:
    """One document per FILE via the ``binaryFile`` source:
    doc_id = md5-derived hash of the file path, text = decoded bytes.
    The scale-native shape for a source-code corpus (north rule:
    10^12 files) — file listing and reads are distributed, and the
    path→id rule is reproducible by any engine that can hash the
    path."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    return df.select(
        md5_long(F.col("path")).alias("doc_id"),
        F.decode(F.col("content"), encoding).alias("text"),
    )
