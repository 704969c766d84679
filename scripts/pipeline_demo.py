#!/usr/bin/env python
"""End-to-end training-data pipeline demo: the composition a user of
the reference engine would actually run at scale, using only this
repo's operators —

  quality filter -> language tag -> exact + near-dup dedup ->
  inverted-index build -> boolean / BM25 / prefix queries
  (distributed + driver-local) -> ANN over embeddings

Prints one JSON summary line and asserts the pipeline's invariants.
Run:  python scripts/pipeline_demo.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("chearch_pipeline_demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from chearch_spark.build import build_index
    from chearch_spark.functions import text as T
    from chearch_spark.operators import ann as A
    from chearch_spark.operators import dedup as D
    from chearch_spark.plans.query import Prefix, Term
    from chearch_spark.search import Index

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    n_raw = docs.count()

    # 1. quality gate (pure projection — no shuffle)
    quality = T.quality_scores(docs)
    kept_q = quality.filter(F.col("quality") >= 0.3).select("doc_id")
    docs_q = docs.join(kept_q, "doc_id")

    # 2. language tag (kept as metadata; a real pipeline routes on it)
    langs = {
        r.pred_lang: r.n
        for r in T.lang_id(docs_q)
        .groupBy("pred_lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    # 3. dedup: exact groups + MinHash near-dup keep-set
    n_exact_dupes = D.exact_duplicates(docs_q).count()
    kept = D.minhash_dedup_keep(docs_q, tau=0.5)
    docs_clean = docs_q.join(kept, "doc_id")
    n_clean = docs_clean.count()

    # 4. index the cleaned corpus
    out = tempfile.mkdtemp(prefix="chearch_demo_ix_")
    res = build_index(spark, docs_clean, out, num_segments=8, resume=False)
    ix = Index(spark, out)

    # 5. query it: boolean, scored, prefix; distributed and local agree
    q = (Term("merge") & Term("sort")) | Prefix("dup")
    dist = [
        (r.doc_id, round(r.score, 9)) for r in ix.search(q, k=10).collect()
    ]
    local = [(d, round(s, 9)) for d, s in ix.local_search(q, k=10)]
    assert dist == local, "local path must equal distributed path"
    n_bool = ix.match_docs(Term("merge") - Term("sort")).count()

    # 6. similarity search over the embeddings table
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ann = A.cosine_topk(emb, [0, 1, 2], k=5).collect()
    assert len(ann) == 15 and all(r.cos <= 1.0 + 1e-9 for r in ann)

    # invariants (note: exact-dup groups of sub-3-token docs produce no
    # shingles and are NOT removed by MinHash dedup, so only <= n_raw
    # is sound in general)
    assert n_clean <= n_raw
    assert res.n_docs == n_clean
    assert dist, "flagship query returned no results"

    print(
        json.dumps(
            {
                "raw_docs": n_raw,
                "after_quality": docs_q.count(),
                "exact_dup_groups": n_exact_dupes,
                "after_dedup": n_clean,
                "langs": langs,
                "indexed_docs": res.n_docs,
                "flagship_top3": dist[:3],
                "diff_matches": n_bool,
                "ann_rows": len(ann),
                "status": "PIPELINE_OK",
            }
        )
    )
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
