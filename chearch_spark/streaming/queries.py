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

Result rows: (batch_id, qid, query, rank, doc_id, score, error),
with batch_id recovered from the hive-style per-batch partition dir
(written with overwrite so an at-least-once batch REPLAY is
idempotent — a blind append would duplicate rows when the driver dies
between the write and the checkpoint commit).  error is NULL for
answered queries; a VALID query with zero hits gets one
all-NULL-payload row (rank NULL + error NULL — an answered empty
result, distinguishable from a lost request); malformed/NULL queries
get one error row; rows with a NULL qid are unaddressable and
dropped.  The reference has no streaming at all; its TCP loop answers
one request per read (`chearch_srv.chpl:20-72`).
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
        rows = [
            r
            for r in batch_df.select("qid", "query").collect()
            if r["qid"] is not None  # a NULL qid is unaddressable
        ]
        if not rows:
            return
        errors: dict[str, str] = {}
        nodes: dict[str, object] = {}
        for q in {r["query"] for r in rows}:
            try:
                if q is None:
                    raise ValueError("null query")
                nodes[q] = ix._prep(q)
            except Exception as exc:  # noqa: BLE001 — a malformed
                # query must fail ONLY itself (the per-frame rule),
                # whatever its failure mode
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
        # LEFT join (null-safe on the key): a VALID query with zero
        # hits still gets one all-NULL-payload row — an answered
        # empty result is distinguishable from a lost request (rank
        # NULL + error NULL) and from a malformed one (error set)
        cond = qmap["query"].eqNullSafe(out["query"])
        (
            qmap.join(F.broadcast(out), cond, "left")
            .drop(out["query"])
            .select(
                "qid", "query", "rank", "doc_id", "score", "error",
            )
            # per-batch partition dir + overwrite: Structured
            # Streaming replays a batch whose append committed but
            # whose checkpoint didn't — overwrite makes the replay
            # idempotent, and the hive-style dirname gives readers
            # the batch_id column back at scan time
            .write.mode("overwrite")
            .parquet(os.path.join(res_dir, f"batch_id={int(batch_id)}"))
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
