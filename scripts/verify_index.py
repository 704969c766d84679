#!/usr/bin/env python
"""Index fsck: validates an index directory against its lineage —
the operational tool behind the north rule's "per-partition lineage +
checkpoint metadata" (a resumable build is only trustworthy if you can
prove what's on disk matches what the manifests say was built).

Covers every layout the engine writes: batch builds (manifest.json),
micro-batch stream ingest (manifest-batch-*.json), and compactions
(manifest-compact-*.json, whose ``replaced`` lists retire older
segment files).

Checks (all raise — never `assert`, so `python -O` cannot strip them):
  1. no compaction is half-finished (a ``replaced`` file still on disk
     means queries see duplicates — rerun compact_stream_segments to
     complete the deletion);
  2. the segment/docmap directories contain EXACTLY the live manifest
     entries' files (stale or missing files both fail);
  3. per-segment doc counts: manifest == docmap rows == meta-row df;
  4. per-segment tokens: manifest == meta-row cf == sum(docmap doc_len);
  5. content fingerprints (spec.content_fp over docmap sha256s):
     per-segment match their manifest; global matches stats.json;
  6. dictionary consistency: sum of per-segment df/cf == dictionary
     (the merge lost nothing);
  7. stats.json totals == sum over live segments;
  8. dict_bounds.json sidecar (if present) matches each dictionary
     file's REAL term range — a stale sidecar would mis-prune probes;
  9. bloom coverage: segments without a bloom entry are reported
     (advisory — the planner always scans them — but they indicate an
     interrupted ingest), as are stale entries for dead segments.

Exit code 0 + one JSON line on success.  Run:
  python scripts/verify_index.py <index_dir>
"""

from __future__ import annotations

import glob
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


def _stream_paths(sid: int) -> tuple[str, str]:
    return (
        f"segments/segment-{sid:09d}.parquet",
        f"docmap/docmap-{sid:09d}.parquet",
    )


def _gather_manifests(path: str):
    """Live per-segment entries across all manifest kinds; compaction
    ``replaced`` files retire older entries."""
    entries: dict[int, dict] = {}
    replaced: set[str] = set()
    batch_manifest = None
    mpath = os.path.join(path, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            batch_manifest = json.load(f)
        for s in batch_manifest["segments"]:
            entries[int(s["seg_id"])] = dict(s)
    for kind in ("manifest-batch-*.json", "manifest-compact-*.json"):
        for mp in sorted(glob.glob(os.path.join(path, kind))):
            with open(mp) as f:
                m = json.load(f)
            for s in m.get("segments", []):
                sid = int(s["seg_id"])
                seg_rel, map_rel = _stream_paths(sid)
                entries[sid] = {**s, "file": seg_rel, "docmap": map_rel}
            replaced |= set(m.get("replaced", []))
    live = {
        sid: e for sid, e in entries.items() if e["file"] not in replaced
    }
    return live, replaced, batch_manifest


def verify(path: str) -> dict:
    stats_path = os.path.join(path, "stats.json")
    _check(
        os.path.exists(stats_path),
        "no stats.json — index was never finalized (run finalize_index)",
    )
    with open(stats_path) as f:
        stats = json.load(f)
    live, replaced, batch_manifest = _gather_manifests(path)
    _check(bool(live), "no manifests describe any segments")

    # 1. half-finished compaction, both crash windows (each recoverable
    # by rerunning compact_stream_segments, and invisible to queries —
    # Index treats both id classes as dead):
    #   1a. manifest published but replaced inputs still on disk
    #       (roll FORWARD: delete them);
    #   1b. orphan outputs — compact-range seg ids whose epoch has no
    #       published manifest (crash between the merge job and the
    #       manifest write; roll BACK: delete the outputs, their
    #       inputs are all still live).
    still = [r for r in replaced if os.path.exists(os.path.join(path, r))]
    _check(
        not still,
        f"pending compaction: replaced files still on disk {still[:4]} — "
        "rerun compact_stream_segments to complete",
    )
    from chearch_spark.streaming.compact import (
        COMPACT_SEG_BASE,
        _epoch_of,
        _manifest_epochs,
    )
    from chearch_spark.streaming.ingest import STREAM_SEG_BASE

    epochs = _manifest_epochs(path)
    seg_listing = (
        os.listdir(os.path.join(path, "segments"))
        if os.path.isdir(os.path.join(path, "segments"))
        else []
    )
    orphans = sorted(
        int(fn[len("segment-"):-len(".parquet")])
        for fn in seg_listing
        if fn.startswith("segment-") and fn.endswith(".parquet")
        and COMPACT_SEG_BASE
        <= int(fn[len("segment-"):-len(".parquet")])
        < STREAM_SEG_BASE
        and _epoch_of(int(fn[len("segment-"):-len(".parquet")]))
        not in epochs
    )
    _check(
        not orphans,
        f"pending compaction: orphan outputs {orphans[:4]} (compact-range "
        "segments whose epoch has no published manifest — a compaction "
        "crashed between its merge job and the manifest write); queries "
        "already ignore them; rerun compact_stream_segments to roll back",
    )

    # 2. disk <-> manifest file-set equality (both directions: a stale
    # extra segment would be served by queries but escape a
    # manifest-only walk)
    for sub in ("segments", "docmap", "dictionary"):
        _check(
            os.path.isdir(os.path.join(path, sub)),
            f"index directory {sub}/ is missing",
        )
    want_segs = {os.path.basename(e["file"]) for e in live.values()}
    want_maps = {os.path.basename(e["docmap"]) for e in live.values()}
    # '.'/'_'-prefixed files are invisible to every reader (crashed
    # write attempts' tmp files) — litter, not corruption; reported
    # separately below
    tmp_litter = sorted(
        os.path.join(sub, fn)
        for sub in ("segments", "docmap")
        for fn in os.listdir(os.path.join(path, sub))
        if fn.startswith((".", "_"))
    )
    have_segs = {
        f
        for f in os.listdir(os.path.join(path, "segments"))
        if not f.startswith((".", "_"))
    }
    have_maps = {
        f
        for f in os.listdir(os.path.join(path, "docmap"))
        if not f.startswith((".", "_"))
    }
    _check(
        have_segs == want_segs,
        f"segment files diverge from manifests: extra={have_segs - want_segs}"
        f" missing={want_segs - have_segs}",
    )
    _check(
        have_maps == want_maps,
        f"docmap files diverge from manifests: extra={have_maps - want_maps}"
        f" missing={want_maps - have_maps}",
    )

    n_docs = n_tokens = 0
    global_fp = 0
    for sid, seg in sorted(live.items()):
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
        global_fp % (2**63) == stats["content_fp"],
        "global content fingerprint mismatch vs stats.json",
    )
    if batch_manifest is not None and len(replaced) == 0 and all(
        sid in live for sid in
        (int(s["seg_id"]) for s in batch_manifest["segments"])
    ) and len(live) == len(batch_manifest["segments"]):
        _check(
            global_fp % (2**63) == batch_manifest["content_fp"],
            "global content fingerprint mismatch vs manifest.json",
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

    # dict_bounds sidecar: a stale sidecar silently mis-prunes probes
    bounds_path = os.path.join(path, "dict_bounds.json")
    if os.path.exists(bounds_path):
        from chearch_spark.build import compute_dict_bounds

        with open(bounds_path) as f:
            bounds = json.load(f)["files"]
        actual = compute_dict_bounds(os.path.join(path, "dictionary"))
        diverged = sorted(
            fn
            for fn in set(bounds) | set(actual)
            if bounds.get(fn) != actual.get(fn)
        )
        _check(
            not diverged,
            f"stale dict bounds sidecar: diverging files {diverged[:4]} "
            f"(sidecar {len(bounds)} files, recomputed {len(actual)})",
        )

    # bloom coverage (advisory: the planner always scans uncovered
    # segments, but they indicate an interrupted ingest)
    bloom_dir = os.path.join(path, "blooms")
    bloom_ids: set[int] = set()
    if os.path.isdir(bloom_dir) and os.listdir(bloom_dir):
        bloom_ids = set(
            ds.dataset(bloom_dir, format="parquet")
            .to_table(columns=["seg_id"])
            .column("seg_id")
            .to_pylist()
        )
    live_ids = set(live)
    # no bloom data at all = zero coverage, the most extreme form of
    # the interrupted-ingest signal this field exists to surface
    bloom_uncovered = sorted(live_ids - bloom_ids)
    bloom_stale = sorted(bloom_ids - live_ids)

    # tombstones: files must decode (a corrupt tombstone silently
    # un-deletes); the count is advisory — pending purges are normal
    # between compactions
    from chearch_spark.tombstones import load_tombstones

    n_tombstones = int(len(load_tombstones(path)))

    return {
        "index": path,
        "segments": len(live),
        "n_docs": n_docs,
        "n_terms": len(dic),
        "content_fp": stats["content_fp"],
        "bloom_uncovered": bloom_uncovered,
        "bloom_stale": bloom_stale,
        "tombstones_pending": n_tombstones,
        "tmp_litter": tmp_litter,
        "status": "INDEX_OK",
    }


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print("usage: python scripts/verify_index.py <index_dir>",
              file=sys.stderr)
        sys.exit(2)
    print(json.dumps(verify(sys.argv[1])))
