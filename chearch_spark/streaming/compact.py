"""Stream-segment compaction: merge the many small segments that
micro-batch ingest accumulates (N batches × num_segments files) into
batch-sized ones, bounding every query's segment fan-out.

Why it exists: each micro-batch writes its own immutable segments
(`ingest.py`), so a long-running stream grows the fan-out without
bound — 10k micro-batches × 8 partitions = 80k segment files that
every scatter-gather query must consider.  The reference's in-memory
engine never faces this (segments are fixed per locale); it is the
cost of the durable, snapshot-isolated file layout, and compaction is
the standard LSM answer.

Compaction is also where tombstoned deletes (:mod:`chearch_spark.
tombstones`) are applied PHYSICALLY: purged docs leave the docmap,
postings, dictionary and stats, making the output byte-equivalent to
a build over the surviving docs.

How: segments are merged by *direct posting algebra* — no original
text needed.  External doc ids from the input docmaps define the
merged doc_index order; per-term posting lists are decoded, remapped,
concatenated, re-sorted and re-encoded (delta+varint), positions ride
along as per-(term,doc) delta groups (deltas reset per group, so whole
groups reorder freely), and block-max metadata is recomputed.  The
merged segment is byte-equivalent to what a batch build over the same
docs-per-segment split would produce.

Execution: one Arrow task per output segment (``mapInArrow`` over a
group-assignment frame); tasks read their input segment files from
shared storage — the same assumption under which the build kernel
writes them.

Crash-safety (two windows, both recoverable and both invisible to
queries):

* merge job done but MANIFEST not yet written → the outputs are
  "orphans" (compact-range seg ids whose epoch has no manifest);
  :func:`replaced_seg_ids` marks them dead, so readers ignore them,
  and the next :func:`compact_stream_segments` rolls them back
  (their inputs are all still live);
* manifest written but old files not yet deleted → the manifest's
  ``replaced`` list marks the inputs dead for readers, and the next
  run (or the fsck) completes the deletion.

Run compaction from the ingest maintenance path, never two
compactions concurrently (concurrent ingest is fine: segments that
land after the input snapshot are untouched, and bloom files are only
deleted when every segment they cover was replaced).  Long-lived
``Index`` handles cache file listings — call ``Index.refresh()`` (or
reopen) after a compaction completes.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd

from chearch_spark import spec
from chearch_spark.build import (
    META_TERM,
    SUMMARY_SCHEMA,
    _atomic_write_parquet,
    _encode_groups,
    write_bloom_file,
)
from chearch_spark.operators import bloom as bloom_mod
from chearch_spark.operators import codec
from chearch_spark.streaming.ingest import STREAM_SEG_BASE

# Compacted segments live in their own id range: above any realistic
# batch segment count, below STREAM_SEG_BASE (so a later compaction
# picks them up again together with newer stream segments).
COMPACT_SEG_BASE = 1 << 29
COMPACT_EPOCH_STRIDE = 100_000


def _decode_posting_rows(sp: pd.DataFrame):
    """Batch-decode EVERY posting row of one segment table (META row
    excluded by the caller) with ONE varint decode per column — the
    vectorized mirror of the build kernel's one-encode-per-column
    (`build._encode_groups`).  LEB128 streams are self-delimiting, so
    concatenating all rows' bytes and decoding once yields the same
    values as per-row decodes, in row order.

    Returns (df, doc_idx, tf, pc, pos):
      df       int64[n_rows]        posting count per row
      doc_idx  int64[sum df]        ABSOLUTE doc indexes (delta undone)
      tf       int64[sum df]
      pc       int64[sum df]        per-(term,doc) kept-position counts
      pos      int64[sum pc]        position DELTAS (reset per group —
                                    groups reorder freely, so deltas
                                    stay valid through the merge)
    """
    n = len(sp)
    df = sp["df"].to_numpy(np.int64)
    total = int(df.sum())
    if n == 0 or total == 0:
        z = np.empty(0, np.int64)
        return df, z, z.copy(), z.copy(), z.copy()

    doc_deltas = codec.decode_varints(
        b"".join(sp["doc_ids"])
    ).astype(np.int64)
    tf = codec.decode_varints(b"".join(sp["tfs"])).astype(np.int64)
    # per-row delta -> absolute: global cumsum minus each row's base
    starts = np.concatenate(([0], np.cumsum(df)))[:-1]
    c = np.cumsum(doc_deltas)
    base = c[starts] - doc_deltas[starts]
    doc_idx = c - np.repeat(base, df)

    # pos_counts: rows without positions store b"" (contributing df
    # zeros), rows with positions store exactly df varints — scatter
    # the decoded values back to the full (sum df) layout
    pc_bins = sp["pos_counts"].to_numpy(object)
    has_pc = np.fromiter(
        (len(b) > 0 for b in pc_bins), dtype=bool, count=n
    )
    pc = np.zeros(total, dtype=np.int64)
    if has_pc.any():
        vals = codec.decode_varints(
            b"".join(pc_bins[has_pc])
        ).astype(np.int64)
        sel = np.repeat(has_pc, df)
        pc[sel] = vals
    pos = codec.decode_varints(b"".join(sp["positions"])).astype(np.int64)
    return df, doc_idx, tf, pc, pos


def _merge_segment_tables(
    inputs: list[tuple[pd.DataFrame, pd.DataFrame]],
    seg_id: int,
    drop_ext: np.ndarray | None = None,
):
    """Merge N (segment_pdf, docmap_pdf) pairs into one segment.

    Pure pandas/numpy (runs inside the Arrow kernel; unit-testable
    without Spark).  Returns (segment_pdf, docmap_pdf, summary_dict)
    with the same shapes as ``build._build_segment_tables``.

    ``drop_ext`` (sorted external doc ids — the tombstone set) purges
    those docs PHYSICALLY: they leave the docmap, their posting
    entries and position groups are dropped, and df/cf/blocks are
    recomputed over survivors — the output is byte-equivalent to a
    direct build over the surviving docs.
    """
    exts, lens, shas = [], [], []
    for _, mp in inputs:
        mp = mp.sort_values("doc_index")
        exts.append(mp["doc_id"].to_numpy(np.int64))
        lens.append(mp["doc_len"].to_numpy(np.int64))
        shas.append(mp["sha256"].to_numpy(object))
    counts = [len(e) for e in exts]
    offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
    ext_all = (
        np.concatenate(exts) if exts else np.empty(0, np.int64)
    )
    len_all = np.concatenate(lens) if lens else np.empty(0, np.int64)
    sha_all = (
        np.concatenate(shas) if shas else np.empty(0, object)
    )
    # stable: duplicate external ids (re-ingested docs) stay distinct
    # entries in input order — engine semantics preserved, not deduped
    order = np.argsort(ext_all, kind="stable")
    if drop_ext is not None and len(drop_ext) and len(ext_all):
        keep = ~np.isin(ext_all, drop_ext)
        order = order[keep[order]]
    new_ext = ext_all[order]
    new_len = len_all[order]
    new_sha = sha_all[order]
    # purged docs remap to -1; their posting entries are dropped below
    remap = np.full(len(ext_all), -1, dtype=np.int64)
    remap[order] = np.arange(len(order))
    n_docs = len(new_ext)
    n_tokens = int(new_len.sum())

    # gather every posting row across inputs into flat group arrays —
    # ONE batched decode per column per input (no per-term Python; the
    # merge kernel matches the build kernel's vectorization so that
    # compaction, the job actually run at 100x scale, stays
    # numpy-bound instead of interpreter-bound)
    term_arrs: list[np.ndarray] = []
    df_arrs, doc_arrs, tf_arrs, pc_arrs, pos_arrs = [], [], [], [], []
    for i, (sp, _) in enumerate(inputs):
        rows = sp[sp["term"] != META_TERM]
        df_i, doc_i, tf_i, pc_i, pos_i = _decode_posting_rows(rows)
        term_arrs.append(rows["term"].to_numpy(object))
        df_arrs.append(df_i)
        doc_arrs.append(remap[offsets[i] + doc_i])
        tf_arrs.append(tf_i)
        pc_arrs.append(pc_i)
        pos_arrs.append(pos_i)

    row_terms = (
        np.concatenate(term_arrs) if term_arrs else np.empty(0, object)
    )
    if len(row_terms):
        codes, uniques = pd.factorize(row_terms, sort=True)
        g_term = np.repeat(codes, np.concatenate(df_arrs))
        g_doc = np.concatenate(doc_arrs)
        g_tf = np.concatenate(tf_arrs)
        g_pc = np.concatenate(pc_arrs)
        pos_all = np.concatenate(pos_arrs) if pos_arrs else np.empty(0, np.int64)
        if (g_doc < 0).any():
            # purge tombstoned docs' posting entries and their whole
            # position groups (deltas reset per group, so removal of a
            # whole group leaves the stream decodable)
            keep_e = g_doc >= 0
            if pos_all.size:
                pos_all = pos_all[np.repeat(keep_e, g_pc)]
            g_term, g_doc, g_tf, g_pc = (
                g_term[keep_e], g_doc[keep_e], g_tf[keep_e], g_pc[keep_e],
            )
        ord2 = np.lexsort((g_doc, g_term))
        # reorder the variable-length position groups along with their
        # (term, doc) entries: gather indexes = per-group ranges
        src_starts = np.concatenate(([0], np.cumsum(g_pc)))[:-1]
        sel_starts = src_starts[ord2]
        sel_counts = g_pc[ord2]
        dst_starts = np.concatenate(([0], np.cumsum(sel_counts)))[:-1]
        gather = (
            np.repeat(sel_starts, sel_counts)
            + np.arange(int(sel_counts.sum()))
            - np.repeat(dst_starts, sel_counts)
        )
        pos_sorted = pos_all[gather]
        g_term, g_doc, g_tf, g_pc = (
            g_term[ord2], g_doc[ord2], g_tf[ord2], g_pc[ord2],
        )
    else:
        uniques = np.empty(0, object)
        g_term = g_doc = g_tf = g_pc = np.empty(0, np.int64)
        pos_sorted = np.empty(0, np.int64)

    # term groups over (term, doc) rows — same encode phase as the
    # batch builder (build.py:_build_segment_tables), starting from
    # already-grouped postings instead of raw occurrences
    if len(g_term):
        term_new = np.empty(len(g_term), dtype=bool)
        term_new[0] = True
        term_new[1:] = g_term[1:] != g_term[:-1]
        term_starts = np.flatnonzero(term_new)
        term_ids = g_term[term_new]
        df_per_term = np.diff(np.concatenate((term_starts, [len(g_term)])))
    else:
        term_starts = np.empty(0, np.int64)
        term_ids = np.empty(0, np.int64)
        df_per_term = np.empty(0, np.int64)

    deltas = g_doc.copy()
    if len(g_doc):
        deltas[1:] = g_doc[1:] - g_doc[:-1]
        deltas[term_starts] = g_doc[term_starts]
    doc_ids_bins = _encode_groups(deltas.astype(np.uint64), term_starts)
    tfs_bins = _encode_groups(g_tf.astype(np.uint64), term_starts)
    cf_per_term = (
        np.add.reduceat(g_tf, term_starts).astype(np.int64)
        if len(term_starts)
        else np.empty(0, np.int64)
    )
    store_positions = bool(g_pc.sum() > 0) or any(
        (sp["pos_counts"].map(bool)).any() for sp, _ in inputs
    )
    if store_positions and len(term_ids):
        pc_bins = _encode_groups(g_pc.astype(np.uint64), term_starts)
        pos_term_starts = np.concatenate(([0], np.cumsum(g_pc)))[term_starts]
        pos_bins = _encode_groups(pos_sorted.astype(np.uint64), pos_term_starts)
    else:
        pc_bins = [b""] * len(term_ids)
        pos_bins = [b""] * len(term_ids)

    # block-max metadata (same layout as the batch builder)
    B = spec.POSTING_BLOCK
    if len(term_ids):
        bounds = np.concatenate((term_starts, [len(g_doc)]))
        term_lens = np.diff(bounds)
        nb_per_term = (term_lens + B - 1) // B
        nb_offsets = np.concatenate(([0], np.cumsum(nb_per_term)))
        block_term = np.repeat(np.arange(len(term_ids)), nb_per_term)
        within = np.arange(len(block_term)) - nb_offsets[block_term]
        bstarts = term_starts[block_term] + within * B
        bends = np.minimum(bstarts + B - 1, bounds[block_term + 1] - 1)
        tri = np.empty(len(bstarts) * 3, dtype=np.uint64)
        tri[0::3] = g_doc[bends]
        tri[1::3] = np.maximum.reduceat(g_tf, bstarts)
        tri[2::3] = np.minimum.reduceat(new_len[g_doc], bstarts)
        blocks_bins = _encode_groups(tri, nb_offsets[:-1] * 3)
    else:
        blocks_bins = []

    terms = [str(uniques[i]) for i in term_ids]
    seg_pdf = pd.DataFrame(
        {
            "seg_id": np.full(len(terms) + 1, seg_id, dtype=np.int32),
            "term": [META_TERM] + terms,
            "df": np.concatenate(([n_docs], df_per_term)).astype(np.int64),
            "cf": np.concatenate(([n_tokens], cf_per_term)).astype(np.int64),
            "doc_ids": [codec.encode_postings(new_ext.astype(np.uint64))]
            + doc_ids_bins,
            "tfs": [codec.encode_varints(new_len.astype(np.uint64))]
            + tfs_bins,
            "pos_counts": [b""] + pc_bins,
            "positions": [b""] + pos_bins,
            "blocks": [b""] + blocks_bins,
        }
    )
    bloom_m, bloom = bloom_mod.make_bloom(terms)
    docmap_pdf = pd.DataFrame(
        {
            "doc_id": new_ext,
            "seg_id": np.full(n_docs, seg_id, dtype=np.int32),
            "doc_index": np.arange(n_docs, dtype=np.int32),
            "doc_len": new_len.astype(np.int32),
            "sha256": new_sha,
        }
    )
    summary = {
        "n_docs": n_docs,
        "n_terms": len(terms),
        "n_tokens": n_tokens,
        "n_postings": int(len(g_doc)),
        "content_fp": spec.content_fp(list(new_sha)),
        "bloom_m": bloom_m,
        "bloom": bloom,
    }
    return seg_pdf, docmap_pdf, summary


def _stream_seg_ids(seg_dir: str) -> list[int]:
    out = []
    for fn in os.listdir(seg_dir):
        if fn.startswith("segment-") and fn.endswith(".parquet"):
            sid = int(fn[len("segment-"):-len(".parquet")])
            if sid >= COMPACT_SEG_BASE:
                out.append(sid)
    return sorted(out)


def _manifest_epochs(out_dir: str) -> set[int]:
    import glob

    out = set()
    for mp in glob.glob(os.path.join(out_dir, "manifest-compact-*.json")):
        out.add(int(os.path.basename(mp)[len("manifest-compact-"):-5]))
    return out


def _epoch_of(sid: int) -> int:
    return (sid - COMPACT_SEG_BASE) // COMPACT_EPOCH_STRIDE


TIER_RATIO = 2.0


def _tiered_select(
    live: list[int],
    n_by_seg: dict[int, int],
    max_inputs: int,
    min_inputs: int = 2,
    tier_ratio: float = TIER_RATIO,
) -> list[int]:
    """AGE-SAFE stack-merge input selection (size-tiered LSM).

    Correctness shape (r4 advisor, medium): merge outputs land ABOVE
    every live compact-range id (the epoch floor) and BELOW every
    stream-range id, and duplicate external ids (re-ingested docs)
    must stay ordered by seg id = creation order.  Pure
    smallest-by-size selection breaks that — merging an OLD small
    compact run while a NEWER larger run stays live re-homes the old
    copies ABOVE the newer run's ids.  A selection preserves order
    iff:

    * its compact-range part is a SUFFIX of the compact-range ids in
      creation order (id order == (epoch, group) order): skipped runs
      are then all OLDER and stay below the output;
    * its stream-range part is a PREFIX of the stream ids: skipped
      stream segments are all NEWER and stay above the output;
    * batch-built segments (the oldest content of all) join only when
      the ENTIRE compact range is merged — otherwise a skipped compact
      run newer than the batch docs would sort below them.

    Schedule inside those shapes: take every fresh stream flush (they
    are the cheap debt), then descend the run stack newest-first,
    including the next-deeper run only while it is at most
    ``tier_ratio`` × the mass already selected — runs therefore grow
    geometrically and each byte is rewritten O(log N) times, the
    classic size-tiered bound, achieved here under the suffix/prefix
    constraint (a "merge the top of the stack" discipline).
    ``min_inputs`` (the policy's fan-out floor) forces the descent
    deeper when the segment bound demands it — the leveled-merge
    fallback.  Simulated totals (docs rewritten; 2 flushes/batch,
    max_segments=6) vs the always-full strategy: 24 batches 174/273,
    96 batches 936/4557, 384 batches 5694/73533 — the r3 "smallest-k"
    selection scored 138/1452/19668 but reversed creation order, and
    count-capped age-safe variants degrade to quadratic because the
    fan-out floor keeps dragging the newest (largest) run back in."""
    compact_seq = sorted(
        s for s in live if COMPACT_SEG_BASE <= s < STREAM_SEG_BASE
    )
    streams = sorted(s for s in live if s >= STREAM_SEG_BASE)
    need = max(2, int(min_inputs))
    sel = streams[: max_inputs]
    mass = sum(n_by_seg[s] for s in sel)
    i = len(compact_seq) - 1
    while i >= 0 and len(sel) < max_inputs:
        r = n_by_seg[compact_seq[i]]
        if len(sel) < need or r <= tier_ratio * mass:
            sel.append(compact_seq[i])
            mass += r
            i -= 1
        else:
            break
    if i < 0:  # entire compact range selected: batch segs may join
        for s in sorted(
            (s for s in live if s < COMPACT_SEG_BASE),
            key=lambda s: (n_by_seg[s], s),
        ):
            if len(sel) >= max_inputs:
                break
            if len(sel) < need or n_by_seg[s] <= tier_ratio * mass:
                sel.append(s)
                mass += n_by_seg[s]
    return sorted(sel)


def replaced_seg_ids(out_dir: str) -> set[int]:
    """Segment ids that queries must treat as DEAD even if their files
    are on disk: (a) ids listed as ``replaced`` by a published
    compaction manifest (crash between publish and deletion), and
    (b) ORPHAN compaction outputs — ids in the compact range whose
    epoch has no published manifest (crash between the merge job and
    the manifest write).  Without (b), a crashed compaction's outputs
    would double-count every doc next to their un-replaced inputs.
    Shared by ``Index`` and ``finalize_index``."""
    import glob

    dead: set[int] = set()
    for mp in glob.glob(os.path.join(out_dir, "manifest-compact-*.json")):
        with open(mp) as f:
            m = json.load(f)
        for rel in m.get("replaced", []):
            fn = os.path.basename(rel)
            if fn.startswith("segment-") and fn.endswith(".parquet"):
                dead.add(int(fn[len("segment-"):-len(".parquet")]))
    epochs = _manifest_epochs(out_dir)
    for sub, prefix in (("segments", "segment-"), ("docmap", "docmap-")):
        d = os.path.join(out_dir, sub)
        if not os.path.isdir(d):
            continue
        for fn in os.listdir(d):
            if fn.startswith(prefix) and fn.endswith(".parquet"):
                sid = int(fn[len(prefix):-len(".parquet")])
                if (
                    COMPACT_SEG_BASE <= sid < STREAM_SEG_BASE
                    and _epoch_of(sid) not in epochs
                ):
                    dead.add(sid)
    return dead


def _complete_pending(out_dir: str) -> None:
    """Finish (or roll back) an interrupted compaction before planning
    a new one:

    * crash between manifest write and old-file deletion → delete every
      ``replaced`` file that still exists (roll FORWARD), plus the
      replaced segments' per-segment bloom files (published kernel-side
      since r5 — the main pass's bloom purge only runs when that pass
      completes, so the crash windows land here);
    * crash between the merge job and the manifest write → delete the
      orphan output files of the unpublished epoch (roll BACK — their
      inputs are all still live, so nothing is lost), including the
      orphan outputs' already-written bloom files."""
    import glob

    from chearch_spark.build import bloom_file_path

    bloom_dir = os.path.join(out_dir, "blooms")
    for mp in sorted(glob.glob(os.path.join(out_dir, "manifest-compact-*.json"))):
        with open(mp) as f:
            m = json.load(f)
        for rel in m.get("replaced", []):
            p = os.path.join(out_dir, rel)
            if os.path.exists(p):
                os.remove(p)
            fn = os.path.basename(rel)
            if fn.startswith("segment-") and fn.endswith(".parquet"):
                bp = bloom_file_path(
                    bloom_dir, int(fn[len("segment-"):-len(".parquet")])
                )
                if os.path.exists(bp):
                    os.remove(bp)
    epochs = _manifest_epochs(out_dir)
    seg_dir = os.path.join(out_dir, "segments")
    map_dir = os.path.join(out_dir, "docmap")
    if os.path.isdir(seg_dir):
        for fn in list(os.listdir(seg_dir)):
            if fn.startswith("segment-") and fn.endswith(".parquet"):
                sid = int(fn[len("segment-"):-len(".parquet")])
                if (
                    COMPACT_SEG_BASE <= sid < STREAM_SEG_BASE
                    and _epoch_of(sid) not in epochs
                ):
                    # docmap FIRST: the orphan classification keys off
                    # segment files, so deleting the segment first and
                    # crashing would leave an undetectable ghost docmap
                    mp = os.path.join(
                        map_dir, f"docmap-{sid:09d}.parquet"
                    )
                    if os.path.exists(mp):
                        os.remove(mp)
                    bp = bloom_file_path(bloom_dir, sid)
                    if os.path.exists(bp):
                        os.remove(bp)
                    os.remove(os.path.join(seg_dir, fn))
    # sweep ghost docmaps whose segment is already gone (crash inside
    # the loop above, pre-fix layouts)
    if os.path.isdir(map_dir):
        for fn in list(os.listdir(map_dir)):
            if fn.startswith("docmap-") and fn.endswith(".parquet"):
                sid = int(fn[len("docmap-"):-len(".parquet")])
                if (
                    COMPACT_SEG_BASE <= sid < STREAM_SEG_BASE
                    and _epoch_of(sid) not in epochs
                    and not os.path.exists(
                        os.path.join(seg_dir, f"segment-{sid:09d}.parquet")
                    )
                ):
                    os.remove(os.path.join(map_dir, fn))


def compact_stream_segments(
    spark,
    out_dir: str,
    *,
    num_segments: int | None = None,
    docs_per_segment: int | None = None,
    finalize: bool = True,
    include_batch: bool = False,
    max_inputs: int | None = None,
    min_inputs: int = 2,
) -> dict | None:
    """Merge ALL stream-written (and previously compacted) segments
    into ``num_segments`` output segments (default: sized by
    ``docs_per_segment``, falling back to the batch builder's default
    cap).  Batch-built segments (ids < COMPACT_SEG_BASE) are left
    untouched unless ``include_batch=True``, which pulls EVERY live
    segment into the merge — the full-rewrite maintenance pass that
    physically purges tombstones from a batch-built index (outputs
    land in the compact id range; the inputs are retired through the
    same crash-safe manifest machinery as stream compaction).  Returns
    the refreshed stats (or None if there was nothing to compact).

    ``max_inputs`` (>= 2): SIZE-TIERED selection — inputs chosen by
    :func:`_tiered_select` (the AGE-SAFE stack-merge schedule: every
    fresh stream flush plus the newest compact runs while each deeper
    run stays within TIER_RATIO of the selected mass), capped at
    ``max_inputs`` and forced at least ``min_inputs`` deep (the
    policy's fan-out floor); the rest is left untouched — the classic
    LSM answer to rewrite amplification.  The crash-safety story is
    unchanged (the manifest lists exactly the replaced subset).  Note
    tombstones are purged only from the MERGED inputs; pending ones
    referencing unmerged segments stay for a later full pass or gc."""
    from pyspark.sql import functions as F

    from chearch_spark.build import DEFAULT_DOCS_PER_SEGMENT
    from chearch_spark.streaming.ingest import _seg_files, finalize_index

    from chearch_spark.tombstones import load_tombstones

    seg_dir = os.path.join(out_dir, "segments")
    map_dir = os.path.join(out_dir, "docmap")
    _complete_pending(out_dir)
    if include_batch:
        dead = replaced_seg_ids(out_dir)
        stream_ids = sorted(
            s for s in _seg_files(seg_dir) if s not in dead
        )
    else:
        stream_ids = _stream_seg_ids(seg_dir)
    tombs = load_tombstones(out_dir)
    if len(stream_ids) == 0:
        return None
    if len(stream_ids) == 1:
        # a single segment is still worth "merging" when tombstones
        # actually PURGE something from it: the pass-through rewrite is
        # what applies them physically.  Tombstones that don't touch
        # this segment (e.g. ids living only in batch segments) must
        # NOT force a rewrite — a periodic maintenance loop would
        # otherwise rewrite the same bytes and burn an epoch per call
        # forever.
        relevant = False
        if len(tombs):
            import pyarrow.parquet as pq_

            fn = os.path.basename(
                _seg_files(seg_dir)[stream_ids[0]]
            )[len("segment-"):]
            dm = pq_.read_table(
                os.path.join(map_dir, f"docmap-{fn}"),
                columns=["doc_id"],
            )
            relevant = bool(
                np.isin(
                    dm.column("doc_id").to_numpy().astype(np.int64),
                    tombs,
                ).any()
            )
        if not relevant:
            return None

    # real input filenames (batch segments use 5-digit names, stream/
    # compact 9-digit — resolve from the listing, never reconstruct)
    files_map = _seg_files(seg_dir)

    def _rel_of(sid: int) -> tuple[str, str]:
        fn = os.path.basename(files_map[sid])
        suffix = fn[len("segment-"):]
        return (f"segments/{fn}", f"docmap/docmap-{suffix}")

    # doc counts: manifests first, docmap footers as fallback
    import glob

    n_by_seg: dict[int, int] = {}
    manifest_paths = sorted(
        glob.glob(os.path.join(out_dir, "manifest-*.json"))
    )
    if os.path.exists(os.path.join(out_dir, "manifest.json")):
        manifest_paths.insert(0, os.path.join(out_dir, "manifest.json"))
    for mp in manifest_paths:
        with open(mp) as f:
            m = json.load(f)
        for s in m.get("segments", []):
            n_by_seg[int(s["seg_id"])] = int(s["n_docs"])
    missing = [s for s in stream_ids if s not in n_by_seg]
    if missing:
        import pyarrow.parquet as pq

        for sid in missing:
            p = os.path.join(out_dir, _rel_of(sid)[1])
            n_by_seg[sid] = pq.ParquetFile(p).metadata.num_rows
    all_live_inputs = list(stream_ids)  # epoch collisions consider ALL
    if max_inputs is not None:
        if max_inputs < 2:
            raise ValueError("max_inputs must be >= 2 (a 1-input "
                             "merge is a pointless rewrite)")
        if len(stream_ids) > 2:
            stream_ids = _tiered_select(
                stream_ids, n_by_seg, max_inputs,
                min_inputs=min_inputs,
            )
    total_docs = sum(n_by_seg[s] for s in stream_ids)
    if num_segments is None:
        cap = docs_per_segment or DEFAULT_DOCS_PER_SEGMENT
        num_segments = max(1, -(-total_docs // cap))
    G = min(int(num_segments), len(stream_ids))
    if G > COMPACT_EPOCH_STRIDE:
        raise ValueError(
            f"num_segments {G} exceeds the per-epoch id stride "
            f"({COMPACT_EPOCH_STRIDE}); outputs would spill into the "
            "next epoch's range and be classified as orphans"
        )

    # output id space: epoch = smallest slot with no published manifest,
    # no live segment in its range, AND no surviving manifest whose
    # `replaced` list names ids in its range — writing into such a slot
    # would resurrect paths a reader still treats as dead (and block
    # that manifest's GC forever).  Fully-applied manifests are
    # garbage-collected below, so slots recycle and the id space never
    # creeps toward STREAM_SEG_BASE.
    live_epochs = {
        _epoch_of(s)
        for s in all_live_inputs
        if COMPACT_SEG_BASE <= s < STREAM_SEG_BASE
    }
    used = live_epochs | _manifest_epochs(out_dir)
    import glob as glob_

    for mp in glob_.glob(os.path.join(out_dir, "manifest-compact-*.json")):
        with open(mp) as f:
            m = json.load(f)
        for rel in m.get("replaced", []):
            fn = os.path.basename(rel)
            if fn.startswith("segment-") and fn.endswith(".parquet"):
                sid = int(fn[len("segment-"):-len(".parquet")])
                if COMPACT_SEG_BASE <= sid < STREAM_SEG_BASE:
                    used.add(_epoch_of(sid))
    # MONOTONIC floor: the new outputs' seg ids must sort AFTER every
    # live compact run's ids.  Merge kernels order duplicate external
    # ids by input seg id (= creation order); with several tiered runs
    # live at once, recycling a slot BELOW a live run would put newer
    # data at lower ids and reverse that order vs a fresh build.
    # Slots above the floor still recycle as their manifests GC, so
    # the id space only creeps by one per pass that leaves the
    # then-highest run alive.
    floor = max(
        (_epoch_of(s) + 1 for s in all_live_inputs
         if COMPACT_SEG_BASE <= s < STREAM_SEG_BASE),
        default=0,
    )
    epoch = floor
    while epoch in used:
        epoch += 1
    max_epochs = (STREAM_SEG_BASE - COMPACT_SEG_BASE) // COMPACT_EPOCH_STRIDE
    if epoch >= max_epochs:
        raise ValueError(
            f"compaction epoch {epoch} exhausts the compact id range "
            f"({max_epochs} slots); rebuild the index (resume=False) to "
            "reset segment ids"
        )
    base = COMPACT_SEG_BASE + epoch * COMPACT_EPOCH_STRIDE

    def _fname(sid: int) -> tuple[str, str]:
        return (
            f"segments/segment-{sid:09d}.parquet",
            f"docmap/docmap-{sid:09d}.parquet",
        )

    # CONTIGUOUS split of the seg_id-sorted (= creation-ordered)
    # inputs: output sid = base + g, so chunk g's docs land at the
    # g-th output id and duplicate external ids spanning two inputs
    # keep creation order ACROSS the run's outputs (a strided split
    # can map an older input to a higher group than a newer one).
    # Chunk boundaries cut on CUMULATIVE DOC MASS, not input count:
    # G is sized by total_docs/docs_per_segment, and a count split of
    # a selection mixing one big run with tiny flushes would hand one
    # kernel (which materializes its whole group) far more than the
    # docs_per_segment memory bound.  Quantile cuts over skewed sizes
    # can coincide — deduping them just emits fewer, fuller outputs.
    cum = np.cumsum(
        np.array([n_by_seg[s] for s in stream_ids], dtype=np.float64)
    )
    cuts = np.searchsorted(
        cum, cum[-1] * np.arange(1, G) / G, side="left"
    ) + 1
    bounds = np.unique(np.concatenate(([0], cuts, [len(stream_ids)])))
    G = len(bounds) - 1
    groups: list[tuple[int, list[int]]] = [
        (g, stream_ids[bounds[g]:bounds[g + 1]]) for g in range(G)
    ]
    rows = [
        (g, json.dumps([_rel_of(s) for s in sids])) for g, sids in groups
    ]
    out_abs = os.path.abspath(out_dir)

    drop_ext = np.sort(tombs.astype(np.int64)) if len(tombs) else None

    def _kernel(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        for b in batches:
            for rec in b.to_pylist():
                g = int(rec["g"])
                sid = base + g
                k0 = time.time()
                seg_path = os.path.join(
                    out_abs, f"segments/segment-{sid:09d}.parquet"
                )
                map_path = os.path.join(
                    out_abs, f"docmap/docmap-{sid:09d}.parquet"
                )
                inputs = []
                for seg_rel, map_rel in json.loads(rec["files"]):
                    inputs.append(
                        (
                            pq.read_table(
                                os.path.join(out_abs, seg_rel)
                            ).to_pandas(),
                            pq.read_table(
                                os.path.join(out_abs, map_rel)
                            ).to_pandas(),
                        )
                    )
                seg_pdf, map_pdf, s = _merge_segment_tables(
                    inputs, sid, drop_ext=drop_ext
                )
                nbytes = _atomic_write_parquet(seg_pdf, seg_path)
                nbytes += _atomic_write_parquet(map_pdf, map_path)
                # bloom published kernel-side (build.SUMMARY_SCHEMA
                # note): written before the summary returns, so blooms
                # still land before the manifest publish below
                write_bloom_file(
                    os.path.join(out_abs, "blooms"),
                    sid, s["bloom_m"], s["bloom"],
                )
                yield pa.RecordBatch.from_pylist(
                    [
                        {
                            "seg_id": sid,
                            "n_docs": s["n_docs"],
                            "n_terms": s["n_terms"],
                            "n_tokens": s["n_tokens"],
                            "n_postings": s["n_postings"],
                            "bytes_written": nbytes,
                            "skipped": False,
                            "wall_sec": time.time() - k0,
                            "content_fp": s["content_fp"],
                        }
                    ]
                )

    summaries = (
        spark.createDataFrame(rows, "g int, files string")
        .repartition(G, "g")
        .mapInArrow(_kernel, SUMMARY_SCHEMA)
        .collect()
    )

    # publish: manifest (blooms already landed kernel-side), then
    # delete replaced inputs
    bloom_dir = os.path.join(out_dir, "blooms")
    os.makedirs(bloom_dir, exist_ok=True)
    replaced = [rel for s in stream_ids for rel in _rel_of(s)]
    manifest = {
        "epoch": epoch,
        "segments": [
            {
                "seg_id": int(r.seg_id),
                "n_docs": int(r.n_docs),
                "n_terms": int(r.n_terms),
                "n_tokens": int(r.n_tokens),
                "n_postings": int(r.n_postings),
                "content_fp": int(r.content_fp),
                "wall_sec": float(r.wall_sec),
            }
            for r in sorted(summaries, key=lambda r: r.seg_id)
        ],
        "replaced": replaced,
    }
    mpath = os.path.join(out_dir, f"manifest-compact-{epoch:06d}.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(mpath + ".tmp", mpath)
    for rel in replaced:
        p = os.path.join(out_dir, rel)
        if os.path.exists(p):
            os.remove(p)
    # garbage-collect fully-applied OLDER compaction manifests: their
    # outputs were this pass's inputs (now replaced and deleted), so
    # keeping them would pin their epoch slots forever.  Only removed
    # once every file they reference (outputs and replaced) is gone —
    # until then they stay, and replaced_seg_ids keeps their ids dead.
    import glob as glob_

    for mp in sorted(
        glob_.glob(os.path.join(out_dir, "manifest-compact-*.json"))
    ):
        e = int(os.path.basename(mp)[len("manifest-compact-"):-5])
        if e == epoch:
            continue
        with open(mp) as f:
            m = json.load(f)
        refs = list(m.get("replaced", []))
        for s in m.get("segments", []):
            refs.extend(_fname(int(s["seg_id"])))
        if all(not os.path.exists(os.path.join(out_dir, r)) for r in refs):
            os.remove(mp)
    # ... and micro-batch manifests whose segments were all compacted
    # away: once the compact manifest that marked them `replaced` is
    # GC'd, a stale batch manifest would make the fsck expect files
    # that are legitimately gone
    for mp in sorted(
        glob_.glob(os.path.join(out_dir, "manifest-batch-*.json"))
    ):
        with open(mp) as f:
            m = json.load(f)
        refs = [
            rel
            for s in m.get("segments", [])
            for rel in _fname(int(s["seg_id"]))
        ]
        if refs and all(
            not os.path.exists(os.path.join(out_dir, r)) for r in refs
        ):
            os.remove(mp)
            # the batch's replay-consistency config dies with it
            bc = os.path.join(
                out_dir,
                "batch_config-"
                + os.path.basename(mp)[len("manifest-batch-"):],
            )
            if os.path.exists(bc):
                os.remove(bc)
    # ... and the BUILD manifest once an include_batch pass retired
    # every batch segment (same resurrection hazard: after the compact
    # manifest that lists them `replaced` is GC'd, a lingering
    # manifest.json would make the fsck expect the retired files)
    bm = os.path.join(out_dir, "manifest.json")
    if os.path.exists(bm):
        with open(bm) as f:
            m = json.load(f)
        refs = [
            rel
            for s in m.get("segments", [])
            for rel in (s.get("file"), s.get("docmap"))
            if rel
        ]
        if refs and all(
            not os.path.exists(os.path.join(out_dir, r)) for r in refs
        ):
            os.remove(bm)
    # drop bloom files whose segments were ALL replaced by this pass
    # (stale entries are harmless for correctness — candidate assembly
    # intersects with live files — but they bloat every probe).  A
    # bloom file written by an ingest that landed AFTER the input
    # snapshot covers live segments and must survive.
    import pyarrow.parquet as pq_

    replaced_ids = {s for s in stream_ids}
    for fn in list(os.listdir(bloom_dir)):
        if fn.startswith("bloom-") and fn.endswith(".parquet"):
            # per-segment file: its one seg id is in the name
            try:
                sid = int(fn[len("bloom-"):-len(".parquet")])
            except ValueError:
                continue
            if sid in replaced_ids:
                os.remove(os.path.join(bloom_dir, fn))
            continue
        # grouped files from pre-distributed-publish indexes (legacy
        # layout, still readable): purge once ALL their ids are dead
        if not (
            fn.startswith("blooms-batch-")
            or fn.startswith("blooms-compact-")
            or fn == "blooms-build.parquet"  # retired by include_batch
        ):
            continue
        ids = (
            pq_.read_table(
                os.path.join(bloom_dir, fn), columns=["seg_id"]
            )
            .column("seg_id")
            .to_pylist()
        )
        if all(int(s) in replaced_ids for s in ids):
            os.remove(os.path.join(bloom_dir, fn))
    if finalize:
        return finalize_index(spark, out_dir)
    return None

def maybe_compact(
    spark,
    out_dir: str,
    *,
    max_segments: int = 16,
    max_tombstone_frac: float = 0.2,
    min_tombstones: int = 1,
    num_segments: int | None = None,
    docs_per_segment: int | None = None,
    include_batch: bool = False,
    gc: bool = True,
    strategy: str = "full",
) -> dict:
    """The compaction DECISION loop: cheap threshold checks, then
    :func:`compact_stream_segments` (+ :func:`gc_tombstones`) only when
    warranted.  Call it from the ingest maintenance path — e.g. once
    per ``foreachBatch`` — and segment fan-out / pending-delete debt
    stay bounded without any operator attention (the reference's S8
    queued indexer running unattended, `queuedindexer.chpl:13-117`,
    extended with the maintenance the reference never reached).

    Triggers (either suffices):

    * ``max_segments`` — more live STREAM-RANGE segments than this
      (batch segments count only when ``include_batch=True``): query
      fan-out debt.  Fires only when compaction can actually REDUCE
      the count: the expected output (``num_segments``, or the
      docs-per-segment-derived count) must sit meaningfully below the
      live count, else the pass would burn an epoch rewriting
      everything for no fan-out gain — when the corpus outgrows the
      (docs_per_segment, max_segments) pair, the trigger waits for
      ~1.5x the achievable floor (bounded amplification) instead of
      refiring every batch.  An explicitly impossible config
      (num_segments > max_segments) raises at once.
    * ``max_tombstone_frac`` — pending tombstones exceed this fraction
      of indexed docs (doc count from manifest totals, so the check
      works mid-stream before any finalize), AND there are at least
      ``min_tombstones`` pending: physical-purge debt.  At 100 TB this
      is the knob that matters — compaction cost is proportional to
      data rewritten, so you trade query-time tombstone filtering
      against rewrite amplification.  Tombstones OUTSIDE the
      compaction scope (docs living in batch segments while
      include_batch=False, or ids never indexed) survive the pass;
      the policy fingerprints the post-pass pending set and suppresses
      this trigger until the set CHANGES — without that memory an
      out-of-scope delete debt would re-fire a full (useless) rewrite
      on every call forever.  Clear such debt with a manual
      ``include_batch=True`` pass.

    The no-trigger path costs one directory listing plus the (small)
    tombstone and manifest reads — no Spark job, safe at any call
    frequency.  Never run two concurrently (same rule as
    compact_stream_segments).  Returns a decision record::

        {"compacted": bool, "reason": str | None,
         "segments": n_live_considered, "pending_tombstones": n,
         "stats": <finalize stats> | None, "gc": <gc result> | None}

    ``strategy``:

    * ``"full"`` (default) — each triggered pass merges every
      in-scope segment: simplest layout (fan-out collapses to the
      target), but a stream that grows forever pays
      O(total/max_segments) rewrites of everything.
    * ``"tiered"`` — a segment-count trigger runs the AGE-SAFE
      stack-merge schedule (:func:`_tiered_select`): every fresh
      micro-batch flush folds together cheaply, and the pass descends
      the compacted-run stack only while each deeper run stays within
      ``TIER_RATIO`` of the mass already selected — runs grow
      geometrically and amortized rewrite work drops from quadratic
      to O(N log N) over the stream's life, without ever merging an
      old run past a newer one (duplicate creation order is
      preserved).  Tombstone-triggered passes still merge the full
      scope (a purge must reach every segment holding deleted
      docs)."""
    import hashlib
    import math

    from chearch_spark.build import DEFAULT_DOCS_PER_SEGMENT
    from chearch_spark.streaming.ingest import _seg_files
    from chearch_spark.tombstones import gc_tombstones, load_tombstones

    if num_segments is not None and num_segments > max_segments:
        raise ValueError(
            f"num_segments={num_segments} > max_segments={max_segments}:"
            " every compaction would immediately re-trigger"
        )
    if strategy not in ("full", "tiered"):
        raise ValueError(f"unknown strategy {strategy!r}")
    seg_dir = os.path.join(out_dir, "segments")
    dead = replaced_seg_ids(out_dir)
    if include_batch:
        live = sorted(s for s in _seg_files(seg_dir) if s not in dead)
    else:
        # exclude replaced ids here too: in the crash window where a
        # pass's replaced input files linger after its manifest
        # publish, the ghosts would inflate the live count and
        # spuriously trigger a rewrite (the merge itself re-snapshots
        # correctly, so this is a cost bug, not a correctness one)
        live = [s for s in _stream_seg_ids(seg_dir) if s not in dead]
    tombs = load_tombstones(out_dir)
    totals = _manifest_totals_live(out_dir)
    n_docs = sum(d for d, _t in totals.values())
    live_set = set(live)
    scope_docs = sum(
        d for sid, (d, _t) in totals.items() if sid in live_set
    )
    tomb_fp = hashlib.md5(tombs.tobytes()).hexdigest() if len(tombs) else ""
    state = _load_policy_state(out_dir)
    # suppression is PER SCOPE: a stream-scope pass settling on
    # batch-resident debt must not silence an include_batch pass that
    # CAN clear it
    settle_key = (
        "settled_tomb_fp_batch" if include_batch
        else "settled_tomb_fp_stream"
    )

    if num_segments is not None:
        target = num_segments
    else:
        dps = docs_per_segment or DEFAULT_DOCS_PER_SEGMENT
        target = max(1, math.ceil(scope_docs / dps))
    # the 1.5x-of-achievable-floor guard exists to stop FULL rewrites
    # from refiring when the corpus outgrew (docs_per_segment,
    # max_segments); a tiered pass rewrites only the smallest inputs,
    # so it triggers on the plain bound
    seg_threshold = (
        max_segments
        if strategy == "tiered"
        else max(max_segments, math.ceil(1.5 * target))
    )
    # TOMBSTONE debt is adjudicated FIRST: a tiered stream in steady
    # state re-triggers the segment bound on (nearly) every call, and
    # tiered fan-out passes purge only the merged smallest inputs — if
    # the segment trigger shadowed this one, delete debt sitting in
    # large unmerged runs would starve forever instead of getting its
    # full-scope purge pass
    reason = None
    tiered_inputs = None
    if (
        len(tombs) >= min_tombstones
        and n_docs > 0
        and len(tombs) / n_docs > max_tombstone_frac
        and tomb_fp != state.get(settle_key, None)
    ):
        reason = (
            f"tombstones {len(tombs)}/{n_docs} > {max_tombstone_frac}"
        )
    elif len(live) > seg_threshold:
        if strategy == "tiered":
            # stack-merge schedule (_tiered_select): every fresh
            # stream flush + the newest runs within TIER_RATIO of the
            # selected mass, descending at least deep enough to get
            # back under the bound — geometric run growth, each byte
            # rewritten O(log N) times (the function's docstring has
            # the simulated totals vs full and vs the age-unsafe
            # smallest-k selection)
            k_min = max(2, len(live) - max_segments + 1)
            # same docmap-footer fallback as the engine's n_by_seg:
            # sizing a manifest-less segment (ingest crash window) as
            # 0 docs would make the guard adjudicate a selection and
            # an out_need the engine never executes
            size_by = {
                s: totals.get(s, (0, 0))[0] for s in live
            }
            missing_sz = [s for s in live if s not in totals]
            if missing_sz:
                import pyarrow.parquet as pq_

                files = _seg_files(seg_dir)
                for s in missing_sz:
                    suffix = os.path.basename(files[s])[len("segment-"):]
                    size_by[s] = pq_.ParquetFile(
                        os.path.join(out_dir, "docmap", f"docmap-{suffix}")
                    ).metadata.num_rows
            sel = _tiered_select(
                live, size_by, len(live), min_inputs=k_min
            )
            dps = docs_per_segment or DEFAULT_DOCS_PER_SEGMENT
            out_need = max(
                1,
                math.ceil(sum(size_by[s] for s in sel) / dps),
            )
            # refire guard: when every candidate input is already at
            # docs-per-segment capacity, folding them emits about as
            # many outputs as it consumed — no fan-out reduction, so
            # firing would rewrite on EVERY call forever (the tiered
            # analogue of the full strategy's 1.5x floor guard).
            # Stay quiet; the corpus has outgrown (docs_per_segment,
            # max_segments) and needs a bigger dps.
            if len(live) - len(sel) + out_need < len(live):
                reason = f"segments {len(live)} > {seg_threshold}"
                tiered_inputs = k_min
        else:
            reason = f"segments {len(live)} > {seg_threshold}"
    out = {
        "compacted": False,
        "reason": reason,
        "segments": len(live),
        "pending_tombstones": int(len(tombs)),
        "stats": None,
        "gc": None,
    }
    if reason is None:
        return out
    if tiered_inputs is not None:
        # tiered fan-out pass: outputs sized by docs_per_segment, NOT
        # the caller's num_segments — forcing a few small inputs into
        # num_segments outputs would emit as many segments as it
        # consumed and make tiering strictly worse than full.  The
        # engine re-runs the same stack-merge selection; max_inputs
        # is uncapped (the schedule self-limits via TIER_RATIO) and
        # min_inputs carries the fan-out floor the guard used.
        stats = compact_stream_segments(
            spark,
            out_dir,
            num_segments=None,
            docs_per_segment=docs_per_segment,
            include_batch=include_batch,
            max_inputs=len(live),
            min_inputs=tiered_inputs,
        )
    else:
        stats = compact_stream_segments(
            spark,
            out_dir,
            num_segments=num_segments,
            docs_per_segment=docs_per_segment,
            include_batch=include_batch,
        )
    out["compacted"] = stats is not None
    out["stats"] = stats
    # gc runs whenever the pass was delete-motivated — even when the
    # merge itself was a no-op (e.g. <=1 stream segment): never-indexed
    # tombstones retire through gc alone
    if gc and len(tombs) and (out["compacted"] or reason.startswith("tombstones")):
        out["gc"] = gc_tombstones(spark, out_dir)
    if reason.startswith("tombstones"):
        remaining = load_tombstones(out_dir)
        # fingerprint what this pass could NOT clear; identical debt
        # will not re-trigger (out-of-scope deletes need include_batch)
        state[settle_key] = (
            hashlib.md5(remaining.tobytes()).hexdigest()
            if len(remaining)
            else ""
        )
        _save_policy_state(out_dir, state)
    return out


_POLICY_STATE = "policy_state.json"


def _load_policy_state(out_dir: str) -> dict:
    p = os.path.join(out_dir, _POLICY_STATE)
    if not os.path.exists(p):
        return {}
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}  # corrupt/missing state only weakens suppression


def _save_policy_state(out_dir: str, state: dict) -> None:
    p = os.path.join(out_dir, _POLICY_STATE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, p)


def _manifest_totals_live(out_dir: str) -> dict[int, tuple[int, int]]:
    """Manifest doc/token totals restricted to LIVE segments — the
    cheap (no-Spark-job) doc count maybe_compact's tombstone-fraction
    trigger divides by."""
    from chearch_spark.streaming.ingest import _manifest_totals

    dead = replaced_seg_ids(out_dir)
    return {
        sid: v
        for sid, v in _manifest_totals(out_dir).items()
        if sid not in dead
    }
