#!/usr/bin/env python
"""Per-operator isolation bench (guide §1.4): same session conf and
action shapes as the frozen bench.py, but each operator is timed alone
(warmup + best-of-3) and its ``explain("formatted")`` is dumped to
plans/r07/<name>_<tag>.txt so plan claims in OPTIMIZATION_r07.md are
checkable without running Spark.

Usage:
    python bench_extra.py [tag] [op ...]

``tag`` labels the explain dumps (before/after); with no ops listed,
every registered operator runs.  $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS
as in bench.py.  This file is NOT part of the driver contract — bench.py
stays frozen.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "probe"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    k = 10
    plans_dir = os.path.join(os.path.dirname(__file__), "plans", "r07")
    os.makedirs(plans_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("chearch_bench_extra")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from chearch_spark.build import build_index
    from chearch_spark.functions import text as T
    from chearch_spark.operators import ann as A
    from chearch_spark.operators import dedup as D
    from chearch_spark.operators import fusion as FU
    from chearch_spark.operators.packing import pack_sequences
    from chearch_spark.operators.percolate import percolate
    from chearch_spark.plans.query import Term, Wildcard
    from chearch_spark.search import Index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.select("doc_id", "text")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus.count()

    # same worker prefork as bench.py
    def _wk(batches):
        import pyarrow as pa

        from chearch_spark import build as _b  # noqa: F401

        yield pa.RecordBatch.from_pylist(
            [{"n": sum(b.num_rows for b in batches)}]
        )

    spark.range(cpus * 4).repartition(cpus * 4).mapInArrow(
        _wk, "n long"
    ).count()

    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="chearch_bx_ix_")
    build_index(spark, corpus, out, num_segments=cpus, resume=False)
    ix = Index(spark, out)

    # (name, df-producer) — .count() on the produced df, like bench.py
    ops: dict = {
        "p_ngram_jaccard": lambda: D.ngram_jaccard_pairs(corpus, tau=0.5),
        "p_simhash_neardup": lambda: D.simhash_pairs(corpus, max_hamming=3),
        "p_minhash_neardup": lambda: D.minhash_lsh_pairs(corpus, tau=0.5),
        "p_exact_dups": lambda: D.exact_duplicates(corpus),
        "p_ann_topk": lambda: A.cosine_topk(emb, [0, 1, 2, 3, 4], k=k),
        "p_ann_lsh": lambda: A.lsh_ann_topk(emb, [0, 1, 2, 3, 4], k=k),
        "p_ann_ivf": lambda: A.ivf_flat_topk(emb, [0, 1, 2, 3, 4], k=k),
        "p_text_quality": lambda: T.quality_scores(corpus),
        "p_snippets": lambda: T.snippets(corpus, ["merge", "sort"], width=3),
        "p_fuzzy_search": lambda: ix.fuzzy_search("merg", k=k),
        "p_hybrid_rrf": lambda: FU.hybrid_rrf(
            ix,
            emb,
            {
                "h_and": (Term("merge") & Term("sort"), 0),
                "h_or": (Term("merge") | Term("dup"), 1),
                "h_single": (Term("sort"), 2),
            },
            k=k,
        ),
        "p_wildcard": lambda: ix.search(Wildcard("s?rt") | Term("dup"), k=k),
        "p_sig_terms": lambda: ix.significant_terms(
            Term("merge") | Term("dup"), docs, k=k
        ),
        "p_mlt": lambda: ix.more_like_this(7, docs, k=k),
        "p_filtered": lambda: ix.search_filtered(
            Term("merge") | Term("dup"), docs, "n_chars >= 400", k=k
        ),
        "p_pack": lambda: pack_sequences(docs, 512),
        "p_percolate": lambda: percolate(
            docs,
            {
                "a1": Term("merge") & Term("sort"),
                "a2": Term("dup"),
                "a3": Term("batch") - Term("the"),
                "a4": "batch AND (dup OR sort)",
                "a5": Term("join") | Term("stream"),
                "a6": Term("sort") & (Term("dup") | Term("merge")),
            },
        ),
        "p_decontaminate": lambda: D.decontaminate(
            docs, docs.filter("doc_id % 37 = 0"), n=5
        ),
    }

    timings = {}
    for name, fn in ops.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"bx:{name}")
        df = fn()
        with open(
            os.path.join(plans_dir, f"{name}_{tag}.txt"), "w"
        ) as f:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            f.write(buf.getvalue())
        if os.environ.get("BX_PLANS_ONLY"):
            print(f"{name:24s} (plan only)", flush=True)
            continue
        fn().count()  # warmup (codegen)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            fn().count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"{name:24s} {best:.3f}", flush=True)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"tag": tag, "sf": sf_dir, "timings": timings}))
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
