#!/usr/bin/env python
"""Reproduce the round-2 bench regressions (p_minhash_neardup,
p_text_quality) with the repo's own noise protocol: warmed Python
workers + warmed codegen, best-of-3.  Prints one JSON line.

Round-1 numbers (BENCH_r01): minhash 3.024s, quality 0.270s.
Round-2 numbers (BENCH_r02): minhash 6.195s, quality 0.863s (best-of-2,
no code change between rounds on either operator).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("REPS", "3"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("chearch_repro")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from chearch_spark.functions import text as T
    from chearch_spark.operators import dedup as D

    corpus = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    corpus.count()

    # warm the Python worker pool (pandas/numpy import storm)
    def _wk(batches):
        import pyarrow as pa

        from chearch_spark import build as _b  # noqa: F401

        yield pa.RecordBatch.from_pylist(
            [{"n": sum(b.num_rows for b in batches)}]
        )

    spark.range(cpus * 4).repartition(cpus * 4).mapInArrow(
        _wk, "n long"
    ).count()

    targets = {
        "p_minhash_neardup": lambda: D.minhash_lsh_pairs(
            corpus, tau=0.5
        ).count(),
        "p_text_quality": lambda: T.quality_scores(corpus).count(),
    }
    out: dict[str, object] = {"sf": sf_dir, "cpus": cpus, "reps": reps}
    for name, fn in targets.items():
        fn()  # codegen warmup
        runs = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"best": min(runs), "runs": runs}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
