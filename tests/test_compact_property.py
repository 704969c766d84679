"""Property test: compacting N segments by posting algebra must be
BYTE-IDENTICAL to building one segment directly from the union of the
documents (Spark-free; both builders are pure pandas/numpy).

This is the strongest possible statement about the merge: not just
"queries agree", but every encoded column — posting deltas, varint tf
streams, per-(term,doc) position delta groups, block-max triples, the
meta row, the bloom, the docmap, the lineage summary — comes out
exactly as if the documents had arrived in one batch.  Any drift in
delta reset points, group-splitting offsets, or block layout fails the
bytes comparison immediately.
"""

import string

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from chearch_spark.build import _build_segment_tables
from chearch_spark.streaming.compact import _merge_segment_tables

_WORDS = st.sampled_from(
    ["merge", "sort", "dup", "alpha", "beta", "x1", "loop_var", "q"]
)
_texts = st.lists(_WORDS, min_size=0, max_size=300).map(" ".join)


@st.composite
def _corpora(draw):
    n = draw(st.integers(min_value=0, max_value=24))
    doc_ids = draw(
        st.lists(
            st.integers(min_value=-50, max_value=10_000),
            min_size=n, max_size=n, unique=True,
        )
    )
    texts = draw(st.lists(_texts, min_size=n, max_size=n))
    n_parts = draw(st.integers(min_value=1, max_value=4))
    assign = draw(
        st.lists(
            st.integers(min_value=0, max_value=n_parts - 1),
            min_size=n, max_size=n,
        )
    )
    return doc_ids, texts, n_parts, assign


def test_merge_many_term_segments():
    """Deterministic large-vocabulary merge (the 100x-scale shape the
    vectorized kernel exists for): 4 input segments, ~8k distinct
    terms, every posting column exercised — byte-identical to the
    direct build, and fast enough that a per-term Python loop regression
    is caught by the wall-clock bound (the old itertuples kernel is
    >10x slower here)."""
    import time

    import numpy as np

    rng = np.random.default_rng(7)
    n_docs, vocab = 600, 8000
    words = [f"w{i:05d}" for i in range(vocab)]
    texts = [
        " ".join(
            words[j]
            for j in rng.integers(0, vocab, size=int(rng.integers(5, 120)))
        )
        for _ in range(n_docs)
    ]
    doc_ids = rng.permutation(n_docs * 3)[:n_docs].astype("int64")
    whole = pd.DataFrame(
        {"doc_id": doc_ids, "text": pd.Series(texts, dtype="object")}
    )
    want_seg, want_map, want_sum = _build_segment_tables(
        whole.copy(), seg_id=7, store_positions=True
    )
    assign = rng.integers(0, 4, size=n_docs)
    inputs = []
    for p in range(4):
        part = whole[assign == p].reset_index(drop=True)
        seg_pdf, map_pdf, _ = _build_segment_tables(
            part, seg_id=100 + p, store_positions=True
        )
        inputs.append((seg_pdf, map_pdf))
    t0 = time.time()
    got_seg, got_map, got_sum = _merge_segment_tables(inputs, seg_id=7)
    wall = time.time() - t0
    for col in want_seg.columns:
        assert got_seg[col].tolist() == want_seg[col].tolist(), col
    for col in want_map.columns:
        assert got_map[col].tolist() == want_map[col].tolist(), col
    assert got_sum == want_sum
    # generous bound (CI boxes are noisy); the point is catching a
    # return to interpreter-bound per-term merging, not micro-tuning
    assert wall < 5.0, f"many-term merge took {wall:.2f}s"


@settings(max_examples=150, deadline=None)
@given(_corpora(), st.booleans())
def test_merge_equals_direct_build(corpus, store_positions):
    doc_ids, texts, n_parts, assign = corpus
    whole = pd.DataFrame(
        {
            "doc_id": pd.Series(doc_ids, dtype="int64"),
            "text": pd.Series(texts, dtype="object"),
        }
    )
    want_seg, want_map, want_sum = _build_segment_tables(
        whole.copy(), seg_id=7, store_positions=store_positions
    )

    import numpy as np

    inputs = []
    for p in range(n_parts):
        mask = np.array(assign, dtype="int64") == p if assign else np.zeros(
            0, dtype=bool
        )
        part = whole[mask].reset_index(drop=True)
        seg_pdf, map_pdf, _ = _build_segment_tables(
            part, seg_id=100 + p, store_positions=store_positions
        )
        inputs.append((seg_pdf, map_pdf))
    got_seg, got_map, got_sum = _merge_segment_tables(inputs, seg_id=7)

    # long documents exercise the >255-position cap; short ones the
    # empty-positions encoding — both must round-trip through the merge
    assert list(got_seg.columns) == list(want_seg.columns)
    for col in want_seg.columns:
        assert got_seg[col].tolist() == want_seg[col].tolist(), col
    for col in want_map.columns:
        assert got_map[col].tolist() == want_map[col].tolist(), col
    for key in ("n_docs", "n_terms", "n_tokens", "n_postings",
                "content_fp", "bloom_m", "bloom"):
        assert got_sum[key] == want_sum[key], key


def test_merge_groups_cut_by_doc_mass(spark, tmp_path_factory):
    """Merge groups must be cut on cumulative DOC MASS, not input
    count: G is sized by total_docs/docs_per_segment, and a count
    split of a selection mixing one big run with tiny flushes would
    hand one kernel (which materializes its whole group) far more
    than the docs_per_segment memory bound."""
    import os

    from chearch_spark.streaming.compact import compact_stream_segments
    from chearch_spark.streaming.ingest import (
        _manifest_totals,
        _seg_files,
        finalize_index,
        ingest_batch,
    )

    out = str(tmp_path_factory.mktemp("mass_cut"))

    def _ingest(b, n, base):
        rows = [(base + i, f"alpha shared unique_{base + i:04d}")
                for i in range(n)]
        ingest_batch(
            spark.createDataFrame(
                pd.DataFrame(rows, columns=["doc_id", "text"])
            ),
            out, batch_id=b, num_segments=1,
        )

    # one big run (20 docs) + three 1-doc flushes
    _ingest(0, 10, 0)
    _ingest(1, 10, 100)
    compact_stream_segments(spark, out, num_segments=1)  # run: 20 docs
    for b, base in ((2, 200), (3, 300), (4, 400)):
        _ingest(b, 1, base)
    # docs_per_segment=12 over 23 total docs -> G=2; a count split
    # would put [run, flush] = 21 docs in ONE kernel; the mass split
    # must isolate the 20-doc run
    compact_stream_segments(spark, out, docs_per_segment=12)
    finalize_index(spark, out)
    from chearch_spark.streaming.compact import replaced_seg_ids

    dead = replaced_seg_ids(out)
    totals = _manifest_totals(out)
    live = [
        s
        for s in _seg_files(os.path.join(out, "segments"))
        if s not in dead
    ]
    sizes = sorted(totals[s][0] for s in live)
    assert sizes == [3, 20], sizes


def test_complete_pending_clears_bloom_litter(spark, tmp_path_factory):
    """Crash-window bloom cleanup: _complete_pending must delete (a)
    an unpublished epoch's orphan bloom files (crash between the merge
    job and the manifest write) and (b) replaced inputs' bloom files
    (crash between the manifest publish and the old-file deletion) —
    otherwise fsck reports bloom_stale forever with no clearing
    mechanism."""
    import json
    import os

    from chearch_spark.build import bloom_file_path, write_bloom_file
    from chearch_spark.streaming.compact import (
        COMPACT_SEG_BASE,
        _complete_pending,
    )
    from chearch_spark.streaming.ingest import STREAM_SEG_BASE

    out = str(tmp_path_factory.mktemp("bloom_litter"))
    seg_dir = os.path.join(out, "segments")
    map_dir = os.path.join(out, "docmap")
    bloom_dir = os.path.join(out, "blooms")
    for p in (seg_dir, map_dir, bloom_dir):
        os.makedirs(p)

    # (a) orphan compact output: epoch 1 has no manifest
    orphan = COMPACT_SEG_BASE + 100_000
    open(os.path.join(seg_dir, f"segment-{orphan:09d}.parquet"), "wb").close()
    open(os.path.join(map_dir, f"docmap-{orphan:09d}.parquet"), "wb").close()
    write_bloom_file(bloom_dir, orphan, 64, b"\x00" * 8)

    # (b) replaced stream input whose files linger post-publish
    replaced_sid = STREAM_SEG_BASE + 7
    rel_seg = f"segments/segment-{replaced_sid:09d}.parquet"
    open(os.path.join(out, rel_seg), "wb").close()
    write_bloom_file(bloom_dir, replaced_sid, 64, b"\x00" * 8)
    with open(
        os.path.join(out, "manifest-compact-000000.json"), "w"
    ) as f:
        json.dump(
            {"epoch": 0, "segments": [], "replaced": [rel_seg]}, f
        )

    _complete_pending(out)
    assert not os.path.exists(bloom_file_path(bloom_dir, orphan))
    assert not os.path.exists(bloom_file_path(bloom_dir, replaced_sid))
    assert not os.path.exists(os.path.join(out, rel_seg))
    assert not os.path.exists(
        os.path.join(seg_dir, f"segment-{orphan:09d}.parquet")
    )
