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
array in the task closure when small, as a Spark broadcast above
``search._TOMB_BROADCAST_THRESHOLD`` — right for the realistic regime
(deletes are a small fraction of 10^12 docs between compactions).  A
corpus with billions of pending deletes should compact, not grow the
set; ``MAX_TOMBSTONES`` guards the ship-to-kernels size.  The cap is
ADVISORY under concurrent writers: two simultaneous ``delete_docs``
calls each check it against the files they saw, so overlapping racers
can jointly land somewhat above it (correctness is unaffected —
``load_tombstones`` dedupes; the cap exists to bound memory, not to
gate semantics).
"""

from __future__ import annotations

import contextlib
import os
import time
import uuid

import numpy as np

# refuse to ship absurd closures; compaction is the pressure valve
MAX_TOMBSTONES = 50_000_000

# gc_tombstones broadcasts the tombstone set into its semi-join only
# while the on-disk files stay under this (the docmap then avoids a
# full shuffle); larger sets switch to a shuffle semi-join
_GC_BROADCAST_BYTES = 32 * 1024 * 1024


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
    # unique name per write: concurrent deletes never clobber.  The
    # tmp basename MUST be dot-prefixed: Spark and pyarrow dataset
    # readers ingest ANY *.parquet in a scanned dir (a kill mid-write
    # would otherwise leave a partial file that crashes every later
    # load, and a kill post-write would silently commit the ids);
    # only '.'/'_' prefixes are skipped by both readers.
    fn = f"tombstones-{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}.parquet"
    tmp = os.path.join(d, "." + fn + ".tmp")
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


def _is_vanished_input(e: Exception) -> bool:
    """True when a Spark failure means an input file disappeared under
    the job (a racing gc's snapshot removal) — matched on the standard
    error classes Spark raises for the condition."""
    msg = str(e)
    return any(
        s in msg
        for s in (
            "FileNotFoundException",
            "PATH_NOT_FOUND",
            "FILE_NOT_EXIST",
            "does not exist",
        )
    )


def gc_tombstones(spark, out_dir: str) -> dict:
    """Retire tombstones no LIVE docmap row references (they were
    physically purged by compactions, or never existed).  One
    distributed semi-join over the docmap; the surviving set is
    written back by SPARK (parquet part files moved into the
    tombstone dir), so the id set NEVER materializes on the driver —
    a ``MAX_TOMBSTONES``-sized worst case stays executor-resident
    instead of becoming ~50M driver Row objects.  Returns
    {"kept": n, "dropped": n}.

    Concurrent-delete safe: the file set is SNAPSHOTTED up front and
    only those exact files are loaded and later removed — a
    delete_docs that lands while the semi-join runs writes a new file
    that survives the GC untouched (deleting it would silently
    resurrect its docs).  The keep-set files are moved in BEFORE the
    snapshot files are removed: a crash in between leaves overlapping
    ids across files, which ``load_tombstones`` dedupes (append-only
    union semantics) — never a resurrection."""
    import shutil

    from pyspark.sql import functions as F

    from chearch_spark.streaming.compact import replaced_seg_ids

    d = _tomb_dir(out_dir)
    listing = os.listdir(d) if os.path.isdir(d) else []
    # maintenance sweep: staging dirs from CRASHED earlier gcs (their
    # kept-set was never moved in, so the old files they adjudicated
    # are still present — dropping the stage loses nothing) and
    # dot-tmp litter from crashed delete_docs writes (uncommitted by
    # definition; an age guard spares a concurrent writer mid-rename)
    now = time.time()
    for fn in listing:
        p = os.path.join(d, fn)
        if fn.startswith(".gc-") and os.path.isdir(p):
            # same age guard as the .tmp sweep: a '.gc-*' stage younger
            # than the cutoff may belong to a gc RUNNING right now
            # (e.g. invoked concurrently with auto_compact's gc);
            # rmtree'ing it would yank that run's staged keep-set
            # mid-write
            try:
                if now - os.path.getmtime(p) > 600:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
        elif fn.startswith(".") and fn.endswith(".tmp"):
            try:
                if now - os.path.getmtime(p) > 600:
                    os.remove(p)
            except OSError:
                pass
    # a racing gc may have removed snapshot files since the listing
    # (its committed keep-set preserves any still-live ids from them):
    # adjudicate only what still exists, and treat files that vanish
    # MID-JOB the same way — already-done work, not an error
    snapshot = sorted(
        f
        for f in listing
        if f.endswith(".parquet") and os.path.exists(os.path.join(d, f))
    )
    if not snapshot:
        return {"kept": 0, "dropped": 0}
    tomb_df = (
        spark.read.parquet(*(os.path.join(d, f) for f in snapshot))
        .select("doc_id")
        .distinct()
        .persist()  # count + semi-join/write share ONE scan+distinct
    )
    map_dir = os.path.join(out_dir, "docmap")
    dm = spark.read.parquet(map_dir).select("seg_id", "doc_id")
    dead = replaced_seg_ids(out_dir)
    if dead:
        dm = dm.filter(~F.col("seg_id").isin([int(s) for s in dead]))
    # realistic (small) sets: broadcast the tombs so the docmap is
    # never shuffled — the matched subset is tiny and only IT pays the
    # distinct's exchange.  Huge sets (above the broadcast budget,
    # judged by on-disk bytes): shuffle semi-join, both sides stay
    # executor-resident end to end.
    snap_bytes = 0
    for f in snapshot:
        with contextlib.suppress(FileNotFoundError):
            snap_bytes += os.path.getsize(os.path.join(d, f))
    if snap_bytes <= _GC_BROADCAST_BYTES:
        kept_df = (
            dm.join(F.broadcast(tomb_df), "doc_id", "left_semi")
            .select("doc_id")
            .distinct()
        )
    else:
        kept_df = tomb_df.join(dm, "doc_id", "left_semi")
    stage = os.path.join(d, f".gc-{uuid.uuid4().hex[:8]}")
    try:
        n_tombs = tomb_df.count()
        if n_tombs == 0:
            for f in snapshot:
                with contextlib.suppress(FileNotFoundError):
                    os.remove(os.path.join(d, f))
            return {"kept": 0, "dropped": 0}
        # distributed write to a dot-prefixed staging dir INSIDE the
        # tombstone dir (same filesystem for os.replace; the '.'
        # prefix hides it from Spark and pyarrow dataset scans), then
        # move each non-empty part file in under the canonical naming
        # scheme.  The kept count comes from the staged files' parquet
        # FOOTERS — O(files) metadata reads, no row decode, no driver
        # collect.
        kept_df.write.mode("overwrite").parquet(stage)
    except Exception as e:  # noqa: BLE001 — narrow re-raise below
        if _is_vanished_input(e):
            # a racing gc removed snapshot files under the running
            # job; its keep-set is committed, so there is nothing
            # left for THIS run to adjudicate
            shutil.rmtree(stage, ignore_errors=True)
            return {"kept": 0, "dropped": 0}
        raise
    finally:
        tomb_df.unpersist()
    import pyarrow.parquet as pq

    kept = 0
    for i, fn in enumerate(sorted(os.listdir(stage))):
        if not fn.endswith(".parquet"):
            continue
        rows = pq.ParquetFile(os.path.join(stage, fn)).metadata.num_rows
        if rows == 0:
            continue
        kept += rows
        dst = (
            f"tombstones-{int(time.time() * 1000):013d}-"
            f"{uuid.uuid4().hex[:8]}-{i:04d}.parquet"
        )
        os.replace(os.path.join(stage, fn), os.path.join(d, dst))
    shutil.rmtree(stage, ignore_errors=True)
    # remove ONLY the files whose ids we adjudicated; a racing gc may
    # have already removed a shared snapshot file after committing ITS
    # keep-set — the ids live on in that keep-set, so a missing file
    # here is already-done work, not an error
    for f in snapshot:
        with contextlib.suppress(FileNotFoundError):
            os.remove(os.path.join(d, f))
    return {"kept": int(kept), "dropped": int(n_tombs - kept)}
