"""Streaming QUERY answering — the serving-side complement of
:mod:`chearch_spark.streaming.ingest`'s build side.

`stream_build` makes the index a continuously-ingesting sink; this
module makes it a continuously-answering source: a Structured
Streaming flow of query strings (qid, query) is answered per
micro-batch with ONE `search_many` job — the TCP server's micro-batch
amortization (`serving.py` ``batch_window_ms``), lifted from socket
threads to `foreachBatch`.  Per batch:

1. collect the batch's (qid, query) rows — query text is k-scale
   driver data, like every request path in the engine;
2. dedupe identical strings and pre-prep each distinct one on the
   driver (a malformed query fails ONLY itself — it becomes an error
   row, the TCP server's per-frame failure rule);
3. answer all valid queries with one `search_many` job (union-of-terms
   pruned scan, per-query top-k);
4. fan results back to every qid via one broadcast join of the tiny
   (qid, query) relation and append to the results parquet —
   foreachBatch batches are serialized per stream, so appends never
   race.

Result rows: (batch_id, qid, query, rank, doc_id, score, error) —
error is NULL for answered queries; error rows carry NULL
rank/doc_id/score.  The reference has no streaming at all; its TCP
loop answers one request per read (`chearch_srv.chpl:20-72`).
"""

from __future__ import annotations

import os


def answer_query_stream(
    ix,
    input_path: str,
    out_dir: str,
    *,
    k: int = 10,
    schema: str = "qid long, query string",
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """readStream(parquet dir of (qid, query) rows) ->
    foreachBatch(one search_many job) -> results parquet under
    ``out_dir``.  With ``available_now`` the stream drains what is
    present and stops (tests/bench); a deployment runs continuously.
    Returns None in drain mode, else the StreamingQuery handle."""
    from pyspark.sql import functions as F

    spark = ix.spark
    os.makedirs(out_dir, exist_ok=True)
    ckpt = checkpoint or os.path.join(out_dir, "_checkpoint")
    res_dir = os.path.join(out_dir, "results")

    def _each(batch_df, batch_id: int) -> None:
        rows = batch_df.select("qid", "query").collect()
        if not rows:
            return
        errors: dict[str, str] = {}
        nodes: dict[str, object] = {}
        for q in {r["query"] for r in rows}:
            try:
                nodes[q] = ix._prep(q)
            except (ValueError, KeyError) as exc:  # incl. parse errors
                errors[q] = str(exc)
        qmap = spark.createDataFrame(
            [(int(r["qid"]), r["query"]) for r in rows],
            "qid long, query string",
        )
        parts = []
        if nodes:
            parts.append(
                ix.search_many(nodes, k=k).select(
                    "query",
                    F.col("rank").cast("int").alias("rank"),
                    "doc_id",
                    "score",
                    F.lit(None).cast("string").alias("error"),
                )
            )
        if errors:
            parts.append(
                spark.createDataFrame(
                    [(q, None, None, None, e) for q, e in errors.items()],
                    "query string, rank int, doc_id long, "
                    "score double, error string",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        (
            qmap.join(F.broadcast(out), "query", "inner")
            .withColumn("batch_id", F.lit(int(batch_id)))
            .select(
                "batch_id", "qid", "query", "rank", "doc_id",
                "score", "error",
            )
            .write.mode("append")
            .parquet(res_dir)
        )

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_path)
    )
    writer = reader.writeStream.foreachBatch(_each).option(
        "checkpointLocation", ckpt
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return None
    return writer.start()
