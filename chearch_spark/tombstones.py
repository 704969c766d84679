"""Document deletes as tombstones — the LSM delete story the reference
leaves as a TODO (`search.chpl:38-39` marks delete unimplemented; so
does Lucene-style immutable-segment design generally: you cannot edit
an immutable posting file, you mark and later merge).

Semantics (pinned):

* :func:`delete_docs` records EXTERNAL doc ids in an append-only
  ``tombstones/`` directory (atomic file writes; idempotent — deleting
  a deleted or unknown id is a no-op).
* Every query path (distributed kernels, driver-local cache path,
  phrase match, boolean match) EXCLUDES tombstoned docs immediately:
  matching posting entries are dropped before scoring, so top-k
  refills with surviving docs.  Corpus statistics (N, avgdl, df/cf)
  remain those of the last finalize until a compaction physically
  purges the docs — the standard immutable-segment behavior (deleted
  docs stop matching at once; scores drift only until the next merge).
* :func:`chearch_spark.streaming.compact.compact_stream_segments`
  applies tombstones during the merge: purged docs leave the docmap,
  the postings, and (after its finalize) the dictionary and global
  stats.  A compacted-then-finalized index answers EXACTLY like an
  index built from scratch without the deleted docs.
* :func:`gc_tombstones` retires tombstones that no live docmap row
  references any more (one distributed semi-join — a maintenance job,
  run after compactions).

Scale notes: the tombstone set ships to kernels as a sorted int64
array in the task closure — right for the realistic regime (deletes
are a small fraction of 10^12 docs between compactions).  A corpus
with billions of pending deletes should compact, not grow the set;
``MAX_TOMBSTONES`` guards the closure size.
"""

from __future__ import annotations

import os
import time
import uuid

import numpy as np

# refuse to ship absurd closures; compaction is the pressure valve
MAX_TOMBSTONES = 50_000_000


def _tomb_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "tombstones")


def delete_docs(out_dir: str, doc_ids) -> int:
    """Tombstone external doc ids (append-only, atomic, idempotent).
    Returns the number of NEW ids recorded (already-tombstoned ids are
    not re-written).  Long-lived ``Index`` handles see the deletes
    after ``refresh()`` (or a reopen); new handles see them at once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    existing = load_tombstones(out_dir)
    fresh = ids[~np.isin(ids, existing)]
    if len(fresh) == 0:
        return 0
    if len(existing) + len(fresh) > MAX_TOMBSTONES:
        raise ValueError(
            f"tombstone set would exceed {MAX_TOMBSTONES}; run "
            "compact_stream_segments to purge before deleting more"
        )
    d = _tomb_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    # unique name per write: concurrent deletes never clobber
    fn = f"tombstones-{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}.parquet"
    tmp = os.path.join(d, fn + ".tmp")
    pq.write_table(pa.table({"doc_id": fresh}), tmp)
    os.replace(tmp, os.path.join(d, fn))
    return int(len(fresh))


def load_tombstones(out_dir: str) -> np.ndarray:
    """Sorted int64 array of all tombstoned external doc ids (empty if
    none).  One pyarrow read of the (small) tombstone files."""
    d = _tomb_dir(out_dir)
    if not os.path.isdir(d) or not any(
        f.endswith(".parquet") for f in os.listdir(d)
    ):
        return np.empty(0, dtype=np.int64)
    import pyarrow.dataset as ds

    col = (
        ds.dataset(d, format="parquet")
        .to_table(columns=["doc_id"])
        .column("doc_id")
        .to_numpy()
    )
    return np.unique(col.astype(np.int64))


def gc_tombstones(spark, out_dir: str) -> dict:
    """Retire tombstones no LIVE docmap row references (they were
    physically purged by compactions, or never existed).  One
    distributed semi-join over the docmap; rewrites the tombstone set
    as a single file.  Returns {"kept": n, "dropped": n}.

    Concurrent-delete safe: the file set is SNAPSHOTTED up front and
    only those exact files are loaded and later removed — a
    delete_docs that lands while the semi-join runs writes a new file
    that survives the GC untouched (deleting it would silently
    resurrect its docs)."""
    from pyspark.sql import functions as F

    from chearch_spark.streaming.compact import replaced_seg_ids

    d = _tomb_dir(out_dir)
    snapshot = sorted(
        f
        for f in (os.listdir(d) if os.path.isdir(d) else [])
        if f.endswith(".parquet")
    )
    if not snapshot:
        return {"kept": 0, "dropped": 0}
    import pyarrow.dataset as ds

    tombs = np.unique(
        ds.dataset(
            [os.path.join(d, f) for f in snapshot], format="parquet"
        )
        .to_table(columns=["doc_id"])
        .column("doc_id")
        .to_numpy()
        .astype(np.int64)
    )
    if len(tombs) == 0:
        return {"kept": 0, "dropped": 0}
    map_dir = os.path.join(out_dir, "docmap")
    dm = spark.read.parquet(map_dir).select("seg_id", "doc_id")
    dead = replaced_seg_ids(out_dir)
    if dead:
        dm = dm.filter(~F.col("seg_id").isin([int(s) for s in dead]))
    tomb_df = spark.createDataFrame(
        [(int(t),) for t in tombs], "doc_id long"
    )
    still = (
        dm.join(F.broadcast(tomb_df), "doc_id", "left_semi")
        .select("doc_id")
        .distinct()
        .collect()
    )
    kept = np.array(sorted(int(r.doc_id) for r in still), dtype=np.int64)
    import pyarrow as pa
    import pyarrow.parquet as pq

    old = snapshot  # remove ONLY the files whose ids we adjudicated
    if len(kept):
        fn = (
            f"tombstones-{int(time.time() * 1000):013d}-"
            f"{uuid.uuid4().hex[:8]}.parquet"
        )
        tmp = os.path.join(d, fn + ".tmp")
        pq.write_table(pa.table({"doc_id": kept}), tmp)
        os.replace(tmp, os.path.join(d, fn))
    for f in old:
        os.remove(os.path.join(d, f))
    return {"kept": int(len(kept)), "dropped": int(len(tombs) - len(kept))}
