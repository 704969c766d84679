"""Distributed index build: document-partitioned segments + global
dictionary (SURVEY.md §3.1 Spark lifecycle, §7.1 P1/P2).

Architecture (chearch parity, re-expressed Spark-first):

* The reference hash-partitions documents across locales and builds one
  in-memory ``MemorySegment`` per locale (`README.md:17`,
  `searchindex.chpl:25-64`).  We hash-partition the corpus with
  ``repartition(S, doc_id)`` and build one *immutable parquet segment*
  per Spark partition inside a single Arrow kernel (``mapInArrow``) —
  tokenize → explode → local group-by-term → sorted, delta+varint
  compressed posting lists.  **No shuffle beyond the one repartition
  exchange**: every posting list is completed locally because segments
  are document-partitioned (exactly chearch's model — queries fan out
  to all segments).
* Global term statistics (df/cf) are merged with a second, tiny
  shuffle over *per-segment pre-aggregated* rows.  Per-segment
  pre-aggregation is the skew defuser: a hot term ("the" in 50% of
  docs) contributes at most ``num_segments`` rows to the merge — the
  same effect as salted two-phase aggregation with segment id as the
  salt, but without a second pass over the data.  (`groupBy` partial
  aggregation then reduces those rows map-side.)
* Scale notes (100 TB / 10^12 files): segments are written *by the
  kernel itself* (pyarrow, atomic tmp→rename), one file per partition,
  so the build is resumable per-partition: a re-run skips partitions
  whose final segment file already exists (checkpoint = file
  presence; per-partition lineage rows land in the manifest).  On a
  real cluster the rename targets an object store / Iceberg commit;
  the layout (segment files + docmap + dictionary + manifest) is the
  Iceberg table layout of the north rule.
* Snapshot isolation falls out of immutability (the reference's
  reader-snapshot counter, `memorysegment.chpl:294-306`, is free here).

Segment file layout (one parquet per segment, rows sorted by term so
parquet row-group min/max stats prune term lookups):

  term=""  meta row: doc_ids = delta+varint of all external doc ids
           (ascending = doc_index order), tfs = varint doc lengths.
  term=t   posting row: df, cf, doc_ids (delta+varint of doc_index),
           tfs (varint, uncapped), pos_counts/positions (varint,
           positions ≤ 255 only — 8-bit textLocation parity,
           `documentid.chpl:22`), blocks (varint triples
           (last_doc, max_tf, min_len) per 128-doc block) for
           block-max WAND pruning.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd

from chearch_spark import spec
from chearch_spark.operators import bloom as bloom_mod
from chearch_spark.operators import codec

META_TERM = ""  # sorts before every real token ([a-z0-9_]+ is non-empty)

SEGMENT_SCHEMA = (
    "seg_id int, term string, df long, cf long, doc_ids binary, "
    "tfs binary, pos_counts binary, positions binary, blocks binary"
)
SUMMARY_SCHEMA = (
    "seg_id long, n_docs long, n_terms long, n_tokens long, "
    "n_postings long, bytes_written long, skipped boolean, "
    "wall_sec double, content_fp long"
)
# Bloom filters do NOT ride the summary rows: at the ~10^5-segment
# design point the per-segment filters (10 bits/term) sum to
# O(total vocabulary) bytes — gigabytes through one driver collect.
# Each kernel publishes its own one-row bloom parquet instead
# (``write_bloom_file``), and the driver collects only the small stats
# columns above.


@dataclass
class BuildResult:
    path: str
    n_docs: int
    n_terms: int
    total_tokens: int
    avgdl: float
    num_segments: int
    skipped_segments: int
    wall_sec: float


def _encode_groups(values: np.ndarray, group_starts: np.ndarray) -> list[bytes]:
    """Varint-encode `values` once, then split the byte stream at group
    boundaries — one encoder call for the whole segment (no per-term
    python encode loop)."""
    buf, lens = codec.encode_varints_with_lengths(values)
    byte_offsets = np.zeros(len(group_starts) + 1, dtype=np.int64)
    cum = np.concatenate(([0], np.cumsum(lens)))
    byte_offsets[:-1] = cum[group_starts]
    byte_offsets[-1] = cum[-1] if len(lens) else 0
    return [
        buf[byte_offsets[i]: byte_offsets[i + 1]]
        for i in range(len(group_starts))
    ]


def _build_segment_tables(pdf: pd.DataFrame, seg_id: int, store_positions: bool):
    """Pure-pandas/numpy segment construction (runs inside the Arrow
    kernel; also unit-testable without Spark).

    Returns (segment_pdf, docmap_pdf, summary_dict)."""
    pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    # doc_index = position in doc_id-ascending order (deterministic
    # regardless of arrival order; replaces the reference's
    # insertion-order documentCount counter, memorysegment.chpl:280)
    ext_ids = pdf["doc_id"].to_numpy(np.int64)
    texts = pdf["text"].fillna("")

    token_lists = texts.str.lower().str.findall(spec.TOKEN_RE)
    doc_len = token_lists.str.len().to_numpy(np.int64)
    n_docs = len(ext_ids)
    n_tokens = int(doc_len.sum())

    exploded = token_lists.explode().dropna()
    doc_rows = exploded.index.to_numpy(np.int64)
    # position within doc: global arange minus each doc's start offset
    starts = np.concatenate(([0], np.cumsum(doc_len)))[:-1]
    positions = np.arange(len(doc_rows), dtype=np.int64) - starts[doc_rows]
    codes, uniques = pd.factorize(exploded.to_numpy(), sort=True)

    # sort occurrences by (term, doc, pos)
    order = np.lexsort((positions, doc_rows, codes))
    t, d, p = codes[order], doc_rows[order], positions[order]

    # (term, doc) groups -> tf
    if len(t):
        td_new = np.empty(len(t), dtype=bool)
        td_new[0] = True
        td_new[1:] = (t[1:] != t[:-1]) | (d[1:] != d[:-1])
        gid = np.cumsum(td_new) - 1
        tf = np.bincount(gid).astype(np.int64)
        g_term = t[td_new]
        g_doc = d[td_new]
    else:
        tf = np.empty(0, dtype=np.int64)
        g_term = np.empty(0, dtype=np.int64)
        g_doc = np.empty(0, dtype=np.int64)

    # term groups over (term, doc) rows
    if len(g_term):
        term_new = np.empty(len(g_term), dtype=bool)
        term_new[0] = True
        term_new[1:] = g_term[1:] != g_term[:-1]
        term_starts = np.flatnonzero(term_new)
        term_ids = g_term[term_new]
        df_per_term = np.diff(np.concatenate((term_starts, [len(g_term)])))
    else:
        term_starts = np.empty(0, dtype=np.int64)
        term_ids = np.empty(0, dtype=np.int64)
        df_per_term = np.empty(0, dtype=np.int64)

    # doc_ids column: per-term deltas (first value absolute)
    deltas = g_doc.copy()
    if len(g_doc):
        deltas[1:] = g_doc[1:] - g_doc[:-1]
        deltas[term_starts] = g_doc[term_starts]
    doc_ids_bins = _encode_groups(deltas.astype(np.uint64), term_starts)
    tfs_bins = _encode_groups(tf.astype(np.uint64), term_starts)
    cf_per_term = (
        np.add.reduceat(tf, term_starts).astype(np.int64)
        if len(term_starts)
        else np.empty(0, dtype=np.int64)
    )

    # positions (<= MAX_POSITION only): per (term,doc) counts + values
    if store_positions and len(t):
        keep = p <= spec.MAX_POSITION
        pos_counts = np.bincount(gid[keep], minlength=len(tf)).astype(np.int64)
        pos_counts_bins = _encode_groups(pos_counts.astype(np.uint64), term_starts)
        # positions per group, delta within group for compactness
        kept_pos = p[keep]
        kept_gid = gid[keep]
        if len(kept_pos):
            pd_new = np.empty(len(kept_gid), dtype=bool)
            pd_new[0] = True
            pd_new[1:] = kept_gid[1:] != kept_gid[:-1]
            pdeltas = kept_pos.copy()
            pdeltas[1:] = kept_pos[1:] - kept_pos[:-1]
            pdeltas[pd_new] = kept_pos[pd_new]
        else:
            pdeltas = kept_pos
        # split positions stream at TERM boundaries (first kept occ of
        # each term): term of each kept occurrence
        kept_term = t[keep]
        if len(kept_term):
            kt_new = np.empty(len(kept_term), dtype=bool)
            kt_new[0] = True
            kt_new[1:] = kept_term[1:] != kept_term[:-1]
            kept_term_starts = np.flatnonzero(kt_new)
            kept_terms = kept_term[kt_new]
        else:
            kept_term_starts = np.empty(0, dtype=np.int64)
            kept_terms = np.empty(0, dtype=np.int64)
        pos_bins_compact = _encode_groups(
            pdeltas.astype(np.uint64), kept_term_starts
        )
        # scatter back to the full term list (terms may have no kept pos)
        pos_map = dict(zip(kept_terms.tolist(), pos_bins_compact))
        positions_bins = [pos_map.get(int(x), b"") for x in term_ids]
    else:
        pos_counts_bins = [b""] * len(term_ids)
        positions_bins = [b""] * len(term_ids)

    # block-max metadata: per POSTING_BLOCK docs (last_doc, max_tf,
    # min_len).  Vectorized over the whole segment (one reduceat per
    # statistic), like every other column — a per-term Python loop here
    # would dominate build time for million-term segments.
    B = spec.POSTING_BLOCK
    if len(term_ids):
        bounds = np.concatenate((term_starts, [len(g_doc)]))
        term_lens = np.diff(bounds)
        nb_per_term = (term_lens + B - 1) // B
        # global block starts: term_start + j*B for j in range(nb)
        nb_offsets = np.concatenate(([0], np.cumsum(nb_per_term)))
        block_term = np.repeat(
            np.arange(len(term_ids)), nb_per_term
        )
        within = np.arange(len(block_term)) - nb_offsets[block_term]
        bstarts = term_starts[block_term] + within * B
        bends = np.minimum(bstarts + B - 1, bounds[block_term + 1] - 1)
        last_doc = g_doc[bends]
        max_tf = np.maximum.reduceat(tf, bstarts)
        min_len = np.minimum.reduceat(doc_len[g_doc], bstarts)
        tri = np.empty(len(bstarts) * 3, dtype=np.uint64)
        tri[0::3] = last_doc
        tri[1::3] = max_tf
        tri[2::3] = min_len
        # split the tri stream at each term's first block (x3 for the
        # three interleaved values)
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
            "doc_ids": [codec.encode_postings(ext_ids.astype(np.uint64))]
            + doc_ids_bins,
            "tfs": [codec.encode_varints(doc_len.astype(np.uint64))] + tfs_bins,
            "pos_counts": [b""] + pos_counts_bins,
            "positions": [b""] + positions_bins,
            "blocks": [b""] + blocks_bins,
        }
    )

    bloom_m, bloom = bloom_mod.make_bloom(terms)

    shas = [spec.content_sha256(x) for x in texts]
    docmap_pdf = pd.DataFrame(
        {
            "doc_id": ext_ids,
            "seg_id": np.full(n_docs, seg_id, dtype=np.int32),
            "doc_index": np.arange(n_docs, dtype=np.int32),
            "doc_len": doc_len.astype(np.int32),
            "sha256": shas,
        }
    )
    fp = spec.content_fp(shas)
    summary = {
        "n_docs": n_docs,
        "n_terms": len(terms),
        "n_tokens": n_tokens,
        "n_postings": int(len(g_doc)),
        "content_fp": fp,
        "bloom_m": bloom_m,
        "bloom": bloom,
    }
    return seg_pdf, docmap_pdf, summary


def dictionary_agg(seg_scan):
    """Dictionary merge aggregation: per term, global df/cf AND the
    exact segment-id list (the term → segments DIRECTORY).  The input
    rows are already pre-aggregated per (segment, term), so the
    directory rides the same tiny shuffle as the stats; hot terms
    (more than ``spec.DICT_SEGS_CAP`` segments) store NULL — their
    list would be "everywhere" and prune nothing.  Query-time, one
    pruned dictionary read returns stats and an EXACT candidate
    segment set (no false positives, unlike the bloom path)."""
    from pyspark.sql import functions as F

    segs = F.sort_array(F.collect_set("seg_id"))
    return seg_scan.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("cf").alias("cf"),
        F.when(F.size(segs) <= spec.DICT_SEGS_CAP, segs).alias("segs"),
    )


def write_dictionary(
    grouped_df, out_dir: str, n_files: int, covered_seg_ids=None
) -> None:
    """Write the merged dictionary RANGE-partitioned by term (each part
    file covers a contiguous term range, rows sorted within), then
    record each file's [min_term, max_term] in a ``dict_bounds.json``
    sidecar at the index root.  A driver probe (term_stats / prefix
    expansion) consults the sidecar and opens only the files whose
    range intersects the query — O(1) file opens instead of listing and
    footer-reading every dictionary file (the difference between ms and
    seconds at a 500k-segment index's dictionary).

    ``repartitionByRange`` costs one sampling pass over the dictionary
    — dictionary-sized (vocabulary rows), not corpus-sized, and paid
    once per build/finalize."""
    d = grouped_df
    if n_files > 1:
        d = d.repartitionByRange(n_files, "term")
    else:
        d = d.coalesce(1)
    dict_dir = os.path.join(out_dir, "dictionary")
    # coverage is invalidated FIRST: a crash between the dictionary
    # overwrite and the coverage rewrite would otherwise leave a NEW
    # dictionary described by the OLD coverage set — the next
    # incremental finalize would re-merge the already-merged segments'
    # rows (doubled df/cf, silently shifted idf).  With no coverage
    # file, incremental declines and the full fallback is always
    # correct.
    cov = os.path.join(out_dir, "dict_coverage.json")
    if os.path.exists(cov):
        os.remove(cov)
    d.sortWithinPartitions("term").write.mode("overwrite").parquet(dict_dir)
    write_dict_bounds(out_dir)
    if covered_seg_ids is not None:
        # which segments the directory describes: segments ingested
        # AFTER this write are not in any segs list and must always be
        # scanned (the same advisory rule as bloom coverage)
        p = os.path.join(out_dir, "dict_coverage.json")
        with open(p + ".tmp", "w") as f:
            json.dump(
                {"seg_ids": sorted(int(s) for s in covered_seg_ids)}, f
            )
        os.replace(p + ".tmp", p)


def compute_dict_bounds(dict_dir: str) -> dict[str, list[str]]:
    """{part_file: [min_term, max_term]} read from the dictionary part
    files — the ONE implementation behind the build-time sidecar, the
    Index's legacy fallback, and the fsck's staleness check (three
    consumers that must never disagree on bounds semantics)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    bounds: dict[str, list[str]] = {}
    for fn in sorted(os.listdir(dict_dir)):
        if not fn.endswith(".parquet"):
            continue
        col = pq.read_table(
            os.path.join(dict_dir, fn), columns=["term"]
        ).column("term")
        if len(col) == 0:
            continue
        bounds[fn] = [pc.min(col).as_py(), pc.max(col).as_py()]
    return bounds


def write_dict_bounds(out_dir: str) -> dict:
    """(Re)build the dictionary bounds sidecar from the part files.
    Build-time one-shot full read of the (small) dictionary — probes
    then never list the directory again."""
    bounds = compute_dict_bounds(os.path.join(out_dir, "dictionary"))
    payload = {"files": bounds}
    p = os.path.join(out_dir, "dict_bounds.json")
    with open(p + ".tmp", "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(p + ".tmp", p)
    return bounds


def _checkpoint_summary(
    seg_path: str, map_path: str, bloom_dir: str, seg_id: int
) -> dict:
    """Summary fields recomputed from an EXISTING segment + docmap pair
    (a resume/replay checkpoint hit): lineage fingerprint rebuilt from
    the real files — zeros would corrupt lineage consumers.  Also
    repairs a missing per-segment bloom file (crash window between the
    segment write and the bloom write; an absent bloom only costs
    pruning — uncovered segments are always scanned — but rebuilding
    it here restores full coverage).  THE one implementation shared by
    the batch build's resume branch and streaming ingest's
    replayed-batch branch (the two feed the same
    SUMMARY_SCHEMA/manifest consumers and must never drift)."""
    import pyarrow.parquet as pq

    mf = pq.read_table(map_path, columns=["doc_len", "sha256"])
    terms = [
        t
        for t in pq.read_table(seg_path, columns=["term"])
        .column("term")
        .to_pylist()
        if t != META_TERM
    ]
    if not os.path.exists(bloom_file_path(bloom_dir, seg_id)):
        bm, bl = bloom_mod.make_bloom(terms)
        write_bloom_file(bloom_dir, seg_id, bm, bl)
    dl = mf.column("doc_len").to_numpy()
    return {
        "n_docs": len(dl),
        "n_terms": len(terms),
        "n_tokens": int(dl.sum()),
        "n_postings": 0,
        "bytes_written": 0,
        "skipped": True,
        "content_fp": spec.content_fp(mf.column("sha256").to_pylist()),
    }


def _summary_row(seg_id: int, s: dict, wall_sec: float) -> dict:
    """Summary dict in SUMMARY_SCHEMA field order (mapInArrow binds
    record-batch columns positionally)."""
    return {
        "seg_id": seg_id,
        "n_docs": s["n_docs"],
        "n_terms": s["n_terms"],
        "n_tokens": s["n_tokens"],
        "n_postings": s["n_postings"],
        "bytes_written": s["bytes_written"],
        "skipped": s["skipped"],
        "wall_sec": wall_sec,
        "content_fp": s["content_fp"],
    }


def _atomic_write_parquet(pdf: pd.DataFrame, final_path: str) -> int:
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    # unique tmp per attempt: concurrent attempts of the same task
    # (speculation, zombies after a stage retry) must never share a
    # tmp path, or a half-written file could be renamed into place.
    # DOT-prefixed basename: Spark and pyarrow dataset readers skip
    # '.'/'_'-prefixed files, so an attempt killed mid-write (partial
    # parquet) or between write and rename (a COMPLETE duplicate of
    # the segment!) is invisible to every reader instead of crashing
    # scans or silently double-counting the segment's rows
    d, base = os.path.split(final_path)
    tmp = os.path.join(
        d, f".{base}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(table, tmp, row_group_size=4096, compression="zstd")
    size = os.path.getsize(tmp)
    os.replace(tmp, final_path)  # atomic checkpoint: presence = done
    return size


def bloom_file_path(bloom_dir: str, seg_id: int) -> str:
    """Per-segment bloom parquet (10-digit id: stream/compact segment
    ids reach 2^31).  The id-in-the-name lets restricted probes open
    exactly the files they need (``read_bloom_map(seg_ids=...)``)
    instead of footer-scanning the whole directory."""
    return os.path.join(bloom_dir, f"bloom-{seg_id:010d}.parquet")


def write_bloom_file(
    bloom_dir: str, seg_id: int, bloom_m: int, bloom: bytes
) -> None:
    """Publish one segment's bloom filter FROM THE KERNEL that built
    the segment (same dot-tmp atomic-rename rules as the segment file)
    — the filter bytes never travel through a driver collect.  At 10
    bits/term a 1M-distinct-term segment's filter is ~1.25 MB; across
    the ~10^5-segment design point that is O(total vocabulary) bytes,
    which must not funnel through one driver."""
    os.makedirs(bloom_dir, exist_ok=True)
    _atomic_write_parquet(
        pd.DataFrame(
            {
                "seg_id": pd.Series([int(seg_id)], dtype="int64"),
                "bloom_m": pd.Series([int(bloom_m)], dtype="int64"),
                "bloom": pd.Series([bloom], dtype="object"),
            }
        ),
        bloom_file_path(bloom_dir, seg_id),
    )


# Default per-segment document cap when num_segments is not given: the
# kernel materializes one partition in executor memory, so segments are
# sized like the reference's 2^24-doc MemorySegment (`documentid.chpl:24`,
# README.md:36) — but 2^21 by default, since our docs (source files) are
# ~100x a tweet.  At 10^12 files this yields ~500k segments; Spark
# schedules that fine, and every segment stays well inside one task's RAM.
DEFAULT_DOCS_PER_SEGMENT = 2 ** 21


def build_index(
    spark,
    corpus_df,
    out_dir: str,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    num_segments: int | None = None,
    docs_per_segment: int = DEFAULT_DOCS_PER_SEGMENT,
    store_positions: bool = True,
    resume: bool = True,
) -> BuildResult:
    """Build (or resume) the inverted index at `out_dir`.

    One repartition exchange, then one Arrow kernel per partition that
    writes its segment + docmap files directly (resumable), then a tiny
    dictionary merge shuffle over per-segment term stats.

    Segment count: explicit ``num_segments`` wins; otherwise it is
    sized so no segment exceeds ``docs_per_segment`` documents (kernel
    memory bound — the reference's segment-capacity rule,
    `documentid.chpl:24`) and no fewer than the default parallelism
    (so every core gets work).
    """
    from pyspark import TaskContext
    from pyspark.sql import functions as F

    t0 = time.time()
    seg_dir = os.path.join(out_dir, "segments")
    map_dir = os.path.join(out_dir, "docmap")
    bloom_dir_ = os.path.join(out_dir, "blooms")
    if not resume:
        # fresh build: stale files from a previous (possibly
        # differently-partitioned) build would otherwise be served by
        # queries, since readers scan the whole directory.  The
        # dictionary/coverage/stats snapshot and tombstones go too —
        # seg ids are reused, so a stale dict_coverage.json would let
        # an incremental finalize merge the OLD contents' term rows,
        # and old tombstones would silently delete from the new corpus
        import shutil

        for d in (
            seg_dir, map_dir, bloom_dir_,
            os.path.join(out_dir, "dictionary"),
            os.path.join(out_dir, "tombstones"),
        ):
            shutil.rmtree(d, ignore_errors=True)
        for f in (
            "dict_coverage.json", "dict_bounds.json", "stats.json",
        ):
            p = os.path.join(out_dir, f)
            if os.path.exists(p):
                os.remove(p)
        # manifests too: a stale compaction manifest whose `replaced`
        # list names the filenames this build is about to recreate
        # would mark the NEW segments dead (and the next compaction
        # would delete them as pending roll-forward)
        import glob as glob_

        for p in (
            [os.path.join(out_dir, "manifest.json")]
            + glob_.glob(os.path.join(out_dir, "manifest-batch-*.json"))
            + glob_.glob(os.path.join(out_dir, "manifest-compact-*.json"))
            + glob_.glob(os.path.join(out_dir, "batch_config-*.json"))
        ):
            if os.path.exists(p):
                os.remove(p)
    os.makedirs(seg_dir, exist_ok=True)
    os.makedirs(map_dir, exist_ok=True)

    corpus = corpus_df.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        F.col(text_col).cast("string").alias("text"),
    )
    cfg_path = os.path.join(out_dir, "build_config.json")
    if resume and os.path.exists(cfg_path):
        # a resumed build MUST use the previous partitioning: with a
        # different segment count, skipped segments keep data hashed
        # under the old modulus while new ones use the new modulus —
        # a silently inconsistent index
        with open(cfg_path) as f:
            prev = json.load(f)
        if num_segments is not None and int(num_segments) != prev["num_segments"]:
            raise ValueError(
                f"resume=True with num_segments={num_segments} but the "
                f"existing build used {prev['num_segments']}; pass "
                "resume=False for a fresh build or match the segment count"
            )
        num_segments = prev["num_segments"]
        if store_positions != prev["store_positions"]:
            raise ValueError(
                "resume=True with a different store_positions than the "
                "existing build"
            )
    elif resume and os.path.isdir(seg_dir) and any(
        f.startswith("segment-") for f in os.listdir(seg_dir)
    ):
        # cfg lost (or pre-cfg index) but segment files exist: resuming
        # with a recomputed S would hash docs under a different modulus
        # than the skipped segments — recover S from the manifest/stats
        # or refuse; never guess
        prev_s = None
        for name in ("manifest.json", "stats.json"):
            p = os.path.join(out_dir, name)
            if os.path.exists(p):
                with open(p) as f:
                    prev_s = json.load(f).get("num_segments")
                if prev_s:
                    break
        if prev_s is None:
            raise ValueError(
                f"resume=True over {out_dir} which has segment files "
                "but no build_config.json/manifest.json/stats.json to "
                "recover the original num_segments; pass resume=False "
                "for a fresh build"
            )
        if num_segments is not None and int(num_segments) != int(prev_s):
            raise ValueError(
                f"resume=True with num_segments={num_segments} but the "
                f"existing index used {prev_s} (recovered from its "
                "manifest); pass resume=False for a fresh build or "
                "match the segment count"
            )
        num_segments = int(prev_s)
    if num_segments is not None:
        S = int(num_segments)
    else:
        n_input = corpus.count()  # cheap: count pushed to the scan
        S = max(
            spark.sparkContext.defaultParallelism,
            -(-n_input // docs_per_segment),  # ceil
        )
    with open(cfg_path + ".tmp", "w") as f:
        json.dump(
            {"num_segments": S, "store_positions": store_positions}, f
        )
    os.replace(cfg_path + ".tmp", cfg_path)

    if resume:
        # an include_batch compaction retires batch segment FILENAMES;
        # a resumed build re-creating those names would either be
        # treated as dead by readers (while the retiring manifest
        # lives) or double-count its docs next to the compacted copies
        # (after that manifest is GC'd).  Refuse whenever a batch id's
        # file is retired-or-missing while compacted/stream segments
        # exist — the only safe resumes into a mixed dir are ones that
        # rebuild nothing.
        from chearch_spark.streaming.compact import (
            COMPACT_SEG_BASE,
            replaced_seg_ids,
        )

        dead = replaced_seg_ids(out_dir)
        foreign = any(
            int(fn[len("segment-"):-len(".parquet")]) >= COMPACT_SEG_BASE
            for fn in (
                os.listdir(seg_dir) if os.path.isdir(seg_dir) else []
            )
            if fn.startswith("segment-") and fn.endswith(".parquet")
        )
        clash = sorted(
            s
            for s in range(S)
            if s in dead
            or (
                foreign
                and not os.path.exists(
                    os.path.join(seg_dir, f"segment-{s:05d}.parquet")
                )
            )
        )
        if clash:
            raise ValueError(
                f"resume=True would recreate segment ids {clash[:4]} "
                "in an index that holds compacted/stream segments — "
                "their docs may already live in compacted outputs (an "
                "include_batch compaction retires batch files); use "
                "resume=False for a fresh build or a new output "
                "directory"
            )

    # document-hash partitioning (chearch README.md:17): one segment per
    # Spark partition; the ONLY full-data shuffle in the build
    parted = corpus.repartition(S, "doc_id")

    def _kernel(batches):
        import pyarrow as pa

        ctx = TaskContext.get()
        seg_id = ctx.partitionId()
        seg_path = os.path.join(seg_dir, f"segment-{seg_id:05d}.parquet")
        map_path = os.path.join(map_dir, f"docmap-{seg_id:05d}.parquet")
        k0 = time.time()
        if resume and os.path.exists(seg_path) and os.path.exists(map_path):
            # checkpoint hit: per-partition resume (north rule);
            # repairs a missing bloom file from the crash window
            summary = pd.DataFrame(
                [
                    _summary_row(
                        seg_id,
                        _checkpoint_summary(
                            seg_path, map_path, bloom_dir_, seg_id
                        ),
                        time.time() - k0,
                    )
                ]
            )
            yield pa.RecordBatch.from_pandas(summary)
            return

        pdfs = [b.to_pandas() for b in batches]
        pdf = (
            pd.concat(pdfs, ignore_index=True)
            if pdfs
            else pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "text": pd.Series(dtype="object"),
                }
            )
        )
        seg_pdf, docmap_pdf, s = _build_segment_tables(
            pdf, seg_id, store_positions
        )
        nbytes = _atomic_write_parquet(seg_pdf, seg_path)
        nbytes += _atomic_write_parquet(docmap_pdf, map_path)
        # per-segment term Bloom filter published HERE, from the same
        # kernel — never through the driver collect (SUMMARY_SCHEMA
        # note).  Written after the segment: a crash in between leaves
        # an uncovered segment (always scanned, safe) that the resume
        # branch repairs.
        write_bloom_file(bloom_dir_, seg_id, s["bloom_m"], s["bloom"])
        summary = pd.DataFrame(
            [
                {
                    "seg_id": seg_id,
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
        yield pa.RecordBatch.from_pandas(summary)

    summaries = parted.mapInArrow(_kernel, SUMMARY_SCHEMA).collect()

    content_fp = int(sum(r.content_fp for r in summaries) % (2**63))
    manifest = {
        "spec_version": spec.SPEC_VERSION,
        "num_segments": S,
        "content_fp": content_fp,
        "segments": [
            {
                "seg_id": int(r.seg_id),
                "file": f"segments/segment-{int(r.seg_id):05d}.parquet",
                "docmap": f"docmap/docmap-{int(r.seg_id):05d}.parquet",
                "n_docs": int(r.n_docs),
                "n_terms": int(r.n_terms),
                "n_tokens": int(r.n_tokens),
                "n_postings": int(r.n_postings),
                "bytes_written": int(r.bytes_written),
                "resumed_from_checkpoint": bool(r.skipped),
                "wall_sec": float(r.wall_sec),
                "content_fp": int(r.content_fp),
            }
            for r in sorted(summaries, key=lambda r: r.seg_id)
        ],
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)

    # segments this build does NOT own (stream ingest / compaction —
    # ids >= 2^29, streaming.compact.COMPACT_SEG_BASE): queries serve
    # their docs too, so batch-only stats/dictionary would be WRONG
    # (stale N/avgdl shifts every BM25 score).  Delegate the snapshot
    # to finalize_index, which scans everything; manifest.json was
    # written first so the batch fingerprints resolve from lineage.
    from chearch_spark.streaming.compact import COMPACT_SEG_BASE as _CSB

    foreign = any(
        int(fn[len("segment-"):-len(".parquet")]) >= _CSB
        for fn in os.listdir(seg_dir)
        if fn.startswith("segment-") and fn.endswith(".parquet")
    )
    if foreign:
        from chearch_spark.streaming.ingest import finalize_index

        stats = finalize_index(spark, out_dir)
        n_docs = int(stats["n_docs"])
        total_tokens = int(stats["total_tokens"])
        avgdl = float(stats["avgdl"])
    else:
        # ---- global dictionary merge (tiny shuffle over pre-aggregated
        # per-segment rows; segment id is the implicit salt — hot terms
        # are bounded at S input rows) --------------------------------
        seg_scan = spark.read.parquet(seg_dir).filter(
            F.col("term") != META_TERM
        )
        # range-partitioned by term + bounds sidecar: probes open O(1)
        # files; row-group min/max stats prune within each file.  The
        # agg also carries the exact term -> segments directory.
        write_dictionary(
            dictionary_agg(seg_scan),
            out_dir,
            max(S // 8, 1),
            covered_seg_ids=[int(r.seg_id) for r in summaries],
        )
        n_docs = int(sum(r.n_docs for r in summaries))
        total_tokens = int(sum(r.n_tokens for r in summaries))
        avgdl = (total_tokens / n_docs) if n_docs else 0.0
        stats = {
            "spec_version": spec.SPEC_VERSION,
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": avgdl,
            "num_segments": S,
            "store_positions": store_positions,
            "content_fp": content_fp,
        }
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=1)

    return BuildResult(
        path=out_dir,
        n_docs=n_docs,
        n_terms=-1,  # vocab size available via dictionary count when needed
        total_tokens=total_tokens,
        avgdl=avgdl,
        num_segments=S,
        skipped_segments=sum(1 for r in summaries if r.skipped),
        wall_sec=time.time() - t0,
    )
