#!/usr/bin/env python
"""spark-submit entry point (north rule: "run via spark-submit
--py-files on a multi-executor cluster").

Packages the engine and submits a build+query job exactly as a cluster
deployment would; in this sandbox the master is local[N], on a real
cluster pass --master/--deploy-mode through SPARK_SUBMIT_ARGS.

Usage:
  python scripts/submit_job.py            # zips chearch_spark, runs
                                          # spark-submit --py-files
  spark-submit --py-files chearch_spark.zip scripts/submit_job.py --run
"""

from __future__ import annotations

import json
import os
import shutil
import shlex
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(dest: str) -> str:
    """Package the engine for --py-files (zip importable from PYTHONPATH)."""
    path = os.path.join(dest, "chearch_spark.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "chearch_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


def run_job() -> None:
    """The job body executed under spark-submit (engine imported from
    the shipped zip, NOT from the repo checkout)."""
    from pyspark.sql import SparkSession

    from chearch_spark.build import build_index
    from chearch_spark.plans.query import Term
    from chearch_spark.search import Index

    spark = SparkSession.builder.appName("chearch_submit_job").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    out = tempfile.mkdtemp(prefix="chearch_submit_ix_")
    try:
        res = build_index(spark, docs, out, num_segments=8, resume=False)
        ix = Index(spark, out)
        rows = ix.search(
            (Term("merge") & Term("sort")) | Term("dup"), k=10
        ).collect()
        print(
            "SUBMIT_JOB_OK "
            + json.dumps(
                {
                    "n_docs": res.n_docs,
                    "topk": [(r.doc_id, round(r.score, 6)) for r in rows],
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


def main() -> None:
    if "--run" in sys.argv:
        run_job()
        return
    tmp = tempfile.mkdtemp(prefix="chearch_submit_")
    try:
        zip_path = make_zip(tmp)
        extra = os.environ.get("SPARK_SUBMIT_ARGS", "--master local[8]")
        cmd = (
            ["spark-submit"]
            + shlex.split(extra)
            + ["--py-files", zip_path, os.path.abspath(__file__), "--run"]
        )
        env = dict(os.environ)
        # the job must import the engine from the zip, not the checkout
        env["PYTHONPATH"] = ""
        print("+", " ".join(cmd), file=sys.stderr)
        proc = subprocess.run(
            cmd, cwd=tmp, env=env, capture_output=True, text=True,
            timeout=600,
        )
        sys.stdout.write(proc.stdout)
        if "SUBMIT_JOB_OK" not in proc.stdout:
            sys.stderr.write(proc.stderr[-4000:])
            sys.exit(1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
