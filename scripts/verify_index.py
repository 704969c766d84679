#!/usr/bin/env python
"""Index fsck: validates an index directory against its manifest —
the operational tool behind the north rule's "per-partition lineage +
checkpoint metadata" (a resumable build is only trustworthy if you can
prove what's on disk matches what the manifest says was built).

Checks:
  1. every manifest segment/docmap file exists;
  2. per-segment doc counts: manifest == docmap rows == meta-row df;
  3. content fingerprint: manifest per-segment fp and global fp match
     the sha256 prefixes recorded in the docmaps;
  4. dictionary consistency: sum of per-segment df/cf == dictionary
     rows (the merge lost nothing);
  5. stats.json totals == sum over segments.

Exit code 0 + one JSON line on success; non-zero with the first
failure otherwise.  Run:  python scripts/verify_index.py <index_dir>
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.dataset as ds
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def verify(path: str) -> dict:
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    with open(os.path.join(path, "stats.json")) as f:
        stats = json.load(f)

    n_docs = n_tokens = 0
    global_fp = 0
    for seg in manifest["segments"]:
        seg_path = os.path.join(path, seg["file"])
        map_path = os.path.join(path, seg["docmap"])
        assert os.path.exists(seg_path), f"missing {seg['file']}"
        assert os.path.exists(map_path), f"missing {seg['docmap']}"
        dm = pq.read_table(map_path, columns=["doc_id", "doc_len", "sha256"])
        assert dm.num_rows == seg["n_docs"], (
            f"seg {seg['seg_id']}: docmap rows {dm.num_rows} != manifest "
            f"{seg['n_docs']}"
        )
        meta = pq.read_table(
            seg_path, columns=["term", "df", "cf"]
        ).to_pandas()
        meta_row = meta[meta["term"] == ""]
        assert len(meta_row) == 1, f"seg {seg['seg_id']}: missing meta row"
        assert int(meta_row["df"].iloc[0]) == seg["n_docs"], (
            f"seg {seg['seg_id']}: meta df != manifest n_docs"
        )
        fp = (
            sum(int(s[:16], 16) for s in dm.column("sha256").to_pylist())
            % (2**63)
        )
        assert fp == seg["content_fp"], (
            f"seg {seg['seg_id']}: content fingerprint mismatch"
        )
        n_docs += seg["n_docs"]
        n_tokens += seg["n_tokens"]
        global_fp += fp

    assert n_docs == stats["n_docs"], "stats.json n_docs mismatch"
    assert n_tokens == stats["total_tokens"], "stats.json tokens mismatch"
    assert global_fp % (2**63) == manifest["content_fp"], (
        "global content fingerprint mismatch"
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
    assert len(seg_terms) == len(dic), (
        f"dictionary has {len(dic)} terms, segments {len(seg_terms)}"
    )
    joined = seg_terms.join(dic, lsuffix="_seg")
    assert (joined["df_seg"] == joined["df"]).all(), "df drift"
    assert (joined["cf_seg"] == joined["cf"]).all(), "cf drift"

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
