#!/usr/bin/env python
"""Index fsck: validates an index directory against its manifest —
the operational tool behind the north rule's "per-partition lineage +
checkpoint metadata" (a resumable build is only trustworthy if you can
prove what's on disk matches what the manifest says was built).

Checks (all raise — never `assert`, so `python -O` cannot strip them):
  1. the segment/docmap directories contain EXACTLY the manifest's
     files (stale or missing files both fail);
  2. per-segment doc counts: manifest == docmap rows == meta-row df;
  3. per-segment tokens: manifest == meta-row cf == sum(docmap doc_len);
  4. content fingerprints (spec.content_fp over docmap sha256s):
     per-segment and global match the manifest;
  5. dictionary consistency: sum of per-segment df/cf == dictionary
     (the merge lost nothing);
  6. stats.json totals == sum over segments.

Exit code 0 + one JSON line on success.  Run:
  python scripts/verify_index.py <index_dir>
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.dataset as ds
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from chearch_spark import spec  # noqa: E402


class IndexCorruption(Exception):
    pass


def _check(cond: bool, msg: str) -> None:
    if not cond:
        raise IndexCorruption(msg)


def verify(path: str) -> dict:
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    with open(os.path.join(path, "stats.json")) as f:
        stats = json.load(f)

    # 1. disk <-> manifest file-set equality (both directions: a stale
    # extra segment would be served by queries but escape a
    # manifest-only walk)
    want_segs = {os.path.basename(s["file"]) for s in manifest["segments"]}
    want_maps = {os.path.basename(s["docmap"]) for s in manifest["segments"]}
    have_segs = set(os.listdir(os.path.join(path, "segments")))
    have_maps = set(os.listdir(os.path.join(path, "docmap")))
    _check(
        have_segs == want_segs,
        f"segment files diverge from manifest: extra={have_segs - want_segs}"
        f" missing={want_segs - have_segs}",
    )
    _check(
        have_maps == want_maps,
        f"docmap files diverge from manifest: extra={have_maps - want_maps}"
        f" missing={want_maps - have_maps}",
    )

    n_docs = n_tokens = 0
    global_fp = 0
    for seg in manifest["segments"]:
        sid = seg["seg_id"]
        dm = pq.read_table(
            os.path.join(path, seg["docmap"]), columns=["doc_len", "sha256"]
        )
        _check(
            dm.num_rows == seg["n_docs"],
            f"seg {sid}: docmap rows {dm.num_rows} != manifest {seg['n_docs']}",
        )
        doc_len_sum = sum(dm.column("doc_len").to_pylist())
        _check(
            doc_len_sum == seg["n_tokens"],
            f"seg {sid}: docmap doc_len sum {doc_len_sum} != manifest "
            f"{seg['n_tokens']}",
        )
        meta = pq.read_table(
            os.path.join(path, seg["file"]),
            columns=["term", "df", "cf"],
            filters=[("term", "==", "")],
        )
        _check(meta.num_rows == 1, f"seg {sid}: missing meta row")
        _check(
            int(meta.column("df")[0].as_py()) == seg["n_docs"],
            f"seg {sid}: meta df != manifest n_docs",
        )
        _check(
            int(meta.column("cf")[0].as_py()) == seg["n_tokens"],
            f"seg {sid}: meta cf != manifest n_tokens",
        )
        fp = spec.content_fp(dm.column("sha256").to_pylist())
        _check(
            fp == seg["content_fp"], f"seg {sid}: content fingerprint mismatch"
        )
        n_docs += seg["n_docs"]
        n_tokens += seg["n_tokens"]
        global_fp += fp

    _check(n_docs == stats["n_docs"], "stats.json n_docs mismatch")
    _check(n_tokens == stats["total_tokens"], "stats.json tokens mismatch")
    _check(
        global_fp % (2**63) == manifest["content_fp"],
        "global content fingerprint mismatch",
    )

    # dictionary == sum of per-segment term stats
    seg_terms = (
        ds.dataset(os.path.join(path, "segments"), format="parquet")
        .to_table(columns=["term", "df", "cf"], filter=ds.field("term") != "")
        .to_pandas()
        .groupby("term", sort=False)
        .sum()
    )
    dic = (
        ds.dataset(os.path.join(path, "dictionary"), format="parquet")
        .to_table()
        .to_pandas()
        .set_index("term")
    )
    _check(
        len(seg_terms) == len(dic),
        f"dictionary has {len(dic)} terms, segments {len(seg_terms)}",
    )
    joined = seg_terms.join(dic, lsuffix="_seg")
    _check(bool((joined["df_seg"] == joined["df"]).all()), "df drift")
    _check(bool((joined["cf_seg"] == joined["cf"]).all()), "cf drift")

    return {
        "index": path,
        "segments": len(manifest["segments"]),
        "n_docs": n_docs,
        "n_terms": len(dic),
        "content_fp": manifest["content_fp"],
        "status": "INDEX_OK",
    }


if __name__ == "__main__":
    print(json.dumps(verify(sys.argv[1])))
