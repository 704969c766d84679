"""maybe_compact — the unattended maintenance loop: segment fan-out
and pending-tombstone debt stay bounded across many micro-batches with
NO manual compact/gc calls, and the resulting index answers exactly
like a fresh batch build over the same (surviving) docs.
"""

import pandas as pd
import pytest

from chearch_spark.build import build_index
from chearch_spark.plans.query import Term
from chearch_spark.search import Index
from chearch_spark.streaming.compact import (
    COMPACT_SEG_BASE,
    maybe_compact,
    replaced_seg_ids,
)
from chearch_spark.streaming.ingest import (
    _seg_files,
    finalize_index,
    ingest_batch,
)
from chearch_spark.tombstones import delete_docs, load_tombstones

ROWS = [
    (i, f"alpha shared w{i % 7} unique_{i:03d} tail")
    for i in range(72)
]


def _live_stream_segments(out: str) -> int:
    import os

    dead = replaced_seg_ids(out)
    return sum(
        1
        for s in _seg_files(os.path.join(out, "segments"))
        if s not in dead
    )


def test_policy_bounds_fanout_across_24_microbatches(
    spark, tmp_index_dir
):
    """24 micro-batches x 2 segments each = 48 files unattended; with
    maybe_compact(max_segments=6) in the per-batch maintenance slot the
    live fan-out never exceeds max_segments + one batch's segments, and
    the final index matches a fresh batch build query-for-query."""
    out = tmp_index_dir
    docs = spark.createDataFrame(
        pd.DataFrame(ROWS, columns=["doc_id", "text"])
    )
    n_batches, per_batch = 24, 2
    compactions = 0
    peak = 0
    for b in range(n_batches):
        ingest_batch(
            docs.filter(f"pmod(doc_id, {n_batches}) = {b}"),
            out,
            batch_id=b,
            num_segments=per_batch,
        )
        res = maybe_compact(
            spark, out, max_segments=6, num_segments=2
        )
        compactions += int(res["compacted"])
        live = _live_stream_segments(out)
        peak = max(peak, live)
        assert live <= 6 + per_batch, f"batch {b}: fan-out {live}"
    assert compactions >= 3  # the loop actually ran, repeatedly
    assert peak > 2  # and was needed (fan-out did grow between runs)

    # steady state: nothing to do, and the no-trigger path is silent
    res = maybe_compact(spark, out, max_segments=6)
    assert res["compacted"] is False and res["reason"] is None

    finalize_index(spark, out)
    ix = Index(spark, out)

    import tempfile

    ref = tempfile.mkdtemp(prefix="chearch_policy_ref_")
    try:
        build_index(spark, docs, ref, num_segments=2, resume=False)
        rix = Index(spark, ref)
        for q in (
            Term("alpha"),
            Term("alpha") & Term("shared"),
            Term("w3") | Term("w5"),
        ):
            got = [
                (int(r.doc_id), float(r.score))
                for r in ix.search(q, k=15).collect()
            ]
            want = [
                (int(r.doc_id), float(r.score))
                for r in rix.search(q, k=15).collect()
            ]
            assert got == want, q
    finally:
        import shutil

        shutil.rmtree(ref, ignore_errors=True)


def test_policy_tombstone_fraction_triggers_purge(spark, tmp_index_dir):
    """Deleting >20% of docs trips the tombstone-frac trigger: one
    maybe_compact call physically purges, gc retires the tombstones,
    and the next call is a no-op."""
    out = tmp_index_dir
    docs = spark.createDataFrame(
        pd.DataFrame(ROWS, columns=["doc_id", "text"])
    )
    for b in range(3):
        ingest_batch(
            docs.filter(f"pmod(doc_id, 3) = {b}"), out,
            batch_id=b, num_segments=2,
        )
    finalize_index(spark, out)
    victims = list(range(0, 72, 4))  # 18/72 = 25% > 20%
    delete_docs(out, victims)

    res = maybe_compact(
        spark, out, max_segments=100, max_tombstone_frac=0.2,
        num_segments=2,
    )
    assert res["compacted"] is True
    assert res["reason"].startswith("tombstones")
    assert res["stats"]["n_docs"] == 72 - len(victims)
    assert res["gc"] == {"kept": 0, "dropped": len(victims)}
    assert load_tombstones(out).size == 0

    again = maybe_compact(
        spark, out, max_segments=100, max_tombstone_frac=0.2
    )
    assert again["compacted"] is False and again["reason"] is None

    # purged docs are gone from queries; scores reflect refreshed stats
    ix = Index(spark, out)
    live = {
        int(r.doc_id) for r in ix.match_docs(Term("alpha")).collect()
    }
    assert not set(victims) & live
    assert len(live) == 72 - len(victims)


def test_policy_below_thresholds_never_compacts(spark, tmp_index_dir):
    """A small, clean index never triggers — the maintenance slot is
    free when there is no debt (no epoch burn, no file churn)."""
    out = tmp_index_dir
    docs = spark.createDataFrame(
        pd.DataFrame(ROWS[:20], columns=["doc_id", "text"])
    )
    for b in range(2):
        ingest_batch(
            docs.filter(f"pmod(doc_id, 2) = {b}"), out,
            batch_id=b, num_segments=2,
        )
    before = sorted(_seg_files(f"{out}/segments"))
    for _ in range(3):
        res = maybe_compact(spark, out, max_segments=16)
        assert res["compacted"] is False
    assert sorted(_seg_files(f"{out}/segments")) == before
    # no compaction outputs (ids in the compact range) were written
    from chearch_spark.streaming.ingest import STREAM_SEG_BASE

    assert not any(
        COMPACT_SEG_BASE <= s < STREAM_SEG_BASE
        for s in _seg_files(f"{out}/segments")
    )


def test_policy_out_of_scope_debt_settles_not_thrashes(
    spark, tmp_index_dir
):
    """Tombstones referencing docs OUTSIDE the compaction scope (batch
    segments, include_batch=False) cannot be cleared by a stream
    compaction: the policy runs ONE delete-motivated pass, fingerprints
    the uncleared debt, and then goes quiet instead of re-firing a full
    rewrite on every call.  A NEW delete re-arms it; an
    include_batch=True pass actually clears the debt."""
    out = tmp_index_dir
    docs = spark.createDataFrame(
        pd.DataFrame(ROWS, columns=["doc_id", "text"])
    )
    build_index(spark, docs, out, num_segments=2, resume=False)
    # one stream segment so the index has a stream scope at all
    ingest_batch(
        spark.createDataFrame(
            pd.DataFrame([(900, "alpha extra")], columns=["doc_id", "text"])
        ),
        out, batch_id=0, num_segments=1,
    )
    finalize_index(spark, out)
    victims = list(range(0, 72, 3))  # 24/73 = 33% > 20%, all in batch segs
    delete_docs(out, victims)

    first = maybe_compact(
        spark, out, max_segments=100, max_tombstone_frac=0.2
    )
    assert first["reason"].startswith("tombstones")
    # debt survives (docs live in batch segments) ...
    assert load_tombstones(out).tolist() == sorted(victims)
    # ... and the policy SETTLES: no re-fire while the set is unchanged
    second = maybe_compact(
        spark, out, max_segments=100, max_tombstone_frac=0.2
    )
    assert second["reason"] is None and second["compacted"] is False

    # a new delete changes the pending set -> re-arms exactly once
    delete_docs(out, [71])
    rearmed = maybe_compact(
        spark, out, max_segments=100, max_tombstone_frac=0.2
    )
    assert rearmed["reason"].startswith("tombstones")
    assert maybe_compact(
        spark, out, max_segments=100, max_tombstone_frac=0.2
    )["reason"] is None

    # include_batch pass clears the debt for real
    cleared = maybe_compact(
        spark, out, max_segments=100, max_tombstone_frac=0.2,
        include_batch=True, num_segments=2,
    )
    assert cleared["compacted"] is True
    assert load_tombstones(out).size == 0
    ix = Index(spark, out)
    live = {
        int(r.doc_id) for r in ix.match_docs(Term("alpha")).collect()
    }
    assert not (set(victims) | {71}) & live


def test_policy_never_indexed_tombstones_gc_without_merge(
    spark, tmp_index_dir
):
    """Deleting ids that were never indexed (legal no-op semantics)
    above the frac threshold: the merge is a no-op but the
    delete-motivated pass still runs gc, which retires them all."""
    out = tmp_index_dir
    docs = spark.createDataFrame(
        pd.DataFrame(ROWS[:20], columns=["doc_id", "text"])
    )
    ingest_batch(docs, out, batch_id=0, num_segments=1)
    finalize_index(spark, out)
    delete_docs(out, list(range(5000, 5010)))  # 10/20 = 50%

    res = maybe_compact(
        spark, out, max_segments=100, max_tombstone_frac=0.2
    )
    assert res["reason"].startswith("tombstones")
    assert res["gc"] == {"kept": 0, "dropped": 10}
    assert load_tombstones(out).size == 0


def test_policy_impossible_config_raises(spark, tmp_index_dir):
    with pytest.raises(ValueError):
        maybe_compact(
            spark, tmp_index_dir, max_segments=4, num_segments=8
        )


def _run_policy_stream(spark, out, docs, strategy, n_batches=24,
                       per_batch=2, max_segments=6):
    """Drive n_batches micro-batches with maybe_compact(strategy=...)
    in the maintenance slot; returns total docs REWRITTEN by
    compactions (sum of output-segment doc counts across all passes,
    tracked via the compact manifests) and the peak live fan-out."""
    from chearch_spark.streaming.ingest import _manifest_totals

    import os

    rewritten = 0
    peak = 0
    for b in range(n_batches):
        ingest_batch(
            docs.filter(f"pmod(doc_id, {n_batches}) = {b}"),
            out, batch_id=b, num_segments=per_batch,
        )
        # epoch slots RECYCLE, so output seg ids repeat across passes;
        # account per pass by diffing the live id set around the call
        dead = replaced_seg_ids(out)
        pre = {
            s
            for s in _seg_files(os.path.join(out, "segments"))
            if s not in dead
        }
        res = maybe_compact(
            spark, out, max_segments=max_segments, strategy=strategy
        )
        if res["compacted"]:
            dead = replaced_seg_ids(out)
            post = {
                s
                for s in _seg_files(os.path.join(out, "segments"))
                if s not in dead
            }
            totals = _manifest_totals(out)
            rewritten += sum(totals[s][0] for s in post - pre)
        peak = max(peak, _live_stream_segments(out))
    return rewritten, peak


def test_tiered_strategy_bounds_fanout_with_less_rewrite(
    spark, tmp_index_dir, tmp_path_factory
):
    """strategy='tiered' merges only the smallest inputs per pass:
    fan-out stays bounded like 'full', total rewrite work is
    SUBSTANTIALLY lower (size-tiered LSM amortization), and the final
    index still answers exactly like a fresh batch build."""
    docs = spark.createDataFrame(
        pd.DataFrame(ROWS, columns=["doc_id", "text"])
    )
    out_t = tmp_index_dir
    rew_t, peak_t = _run_policy_stream(spark, out_t, docs, "tiered")
    out_f = str(tmp_path_factory.mktemp("policy_full"))
    rew_f, peak_f = _run_policy_stream(spark, out_f, docs, "full")

    assert peak_t <= 6 + 2 and peak_f <= 6 + 2
    # the amortization claim, measured: tiered rewrites well under
    # the full strategy's total (full re-merges ALL docs every pass)
    assert rew_t < 0.7 * rew_f, (rew_t, rew_f)

    finalize_index(spark, out_t)
    ix = Index(spark, out_t)
    import tempfile

    ref = tempfile.mkdtemp(prefix="chearch_tier_ref_")
    try:
        build_index(spark, docs, ref, num_segments=2, resume=False)
        rix = Index(spark, ref)
        assert ix.stats["content_fp"] == rix.stats["content_fp"]
        for q in (Term("alpha"), Term("alpha") & Term("shared")):
            got = [
                (int(r.doc_id), float(r.score))
                for r in ix.search(q, k=15).collect()
            ]
            want = [
                (int(r.doc_id), float(r.score))
                for r in rix.search(q, k=15).collect()
            ]
            assert got == want, q
    finally:
        import shutil

        shutil.rmtree(ref, ignore_errors=True)


def test_tiered_tombstone_pass_purges_full_scope(spark, tmp_index_dir):
    """Under strategy='tiered' a TOMBSTONE-triggered pass still merges
    the full stream scope — a purge must reach every segment holding
    deleted docs, so tiering applies only to fan-out passes."""
    out = tmp_index_dir
    docs = spark.createDataFrame(
        pd.DataFrame(ROWS, columns=["doc_id", "text"])
    )
    for b in range(3):
        ingest_batch(
            docs.filter(f"pmod(doc_id, 3) = {b}"), out,
            batch_id=b, num_segments=2,
        )
    finalize_index(spark, out)
    victims = list(range(0, 72, 4))
    delete_docs(out, victims)
    res = maybe_compact(
        spark, out, max_segments=100, max_tombstone_frac=0.2,
        num_segments=2, strategy="tiered",
    )
    assert res["compacted"] is True
    assert res["stats"]["n_docs"] == 72 - len(victims)
    assert load_tombstones(out).size == 0
    live = {
        int(r.doc_id)
        for r in Index(spark, out).match_docs(Term("alpha")).collect()
    }
    assert len(live) == 72 - len(victims)


def test_tiered_refire_guard_when_segments_at_capacity(
    spark, tmp_index_dir
):
    """When every live segment already sits at docs-per-segment
    capacity, a tiered fold emits as many outputs as it consumes — no
    fan-out reduction is possible, so the trigger must stay QUIET
    instead of rewriting half the corpus on every maintenance call."""
    out = tmp_index_dir
    docs = spark.createDataFrame(
        pd.DataFrame(ROWS, columns=["doc_id", "text"])
    )
    for b in range(4):
        ingest_batch(
            docs.filter(f"pmod(doc_id, 4) = {b}"), out,
            batch_id=b, num_segments=3,
        )
    # 12 live segments of >=2 docs each (hash split is uneven);
    # docs_per_segment=2 means any fold of k segments needs >= k
    # outputs -> no fan-out reduction achievable at this capacity
    res = maybe_compact(
        spark, out, max_segments=4, strategy="tiered",
        docs_per_segment=2,
    )
    assert res["compacted"] is False and res["reason"] is None
    # raising the capacity makes reduction possible -> fires and folds
    res2 = maybe_compact(
        spark, out, max_segments=4, strategy="tiered",
        docs_per_segment=72,
    )
    assert res2["compacted"] is True
    assert _live_stream_segments(out) <= 7  # 12 - k(6) + 1


def test_tombstone_trigger_outranks_segment_trigger(
    spark, tmp_index_dir
):
    """When BOTH triggers fire, the delete-motivated full-scope pass
    runs (under tiered, a segment-first policy would purge only the
    smallest inputs and starve delete debt in the large runs)."""
    out = tmp_index_dir
    docs = spark.createDataFrame(
        pd.DataFrame(ROWS, columns=["doc_id", "text"])
    )
    for b in range(8):
        ingest_batch(
            docs.filter(f"pmod(doc_id, 8) = {b}"), out,
            batch_id=b, num_segments=2,
        )
    finalize_index(spark, out)
    victims = list(range(0, 72, 4))  # 25% > 20%
    delete_docs(out, victims)
    res = maybe_compact(
        spark, out, max_segments=4, max_tombstone_frac=0.2,
        strategy="tiered",
    )
    assert res["reason"].startswith("tombstones")
    assert res["compacted"] is True
    # FULL scope purged: every tombstone retired by the pass's gc
    assert load_tombstones(out).size == 0
    assert res["stats"]["n_docs"] == 72 - len(victims)


def test_tiered_select_is_age_safe():
    """r4 advisor (medium): pure smallest-by-size selection could merge
    an OLD small compact run past a NEWER larger one — the epoch floor
    then re-homes the old copies ABOVE the newer run, reversing
    duplicate creation order.  _tiered_select must only pick compact
    runs as a newest-suffix, streams as an oldest-prefix, and batch
    segments only together with the whole compact range."""
    from chearch_spark.streaming.compact import (
        COMPACT_EPOCH_STRIDE,
        _tiered_select,
    )
    from chearch_spark.streaming.ingest import STREAM_SEG_BASE

    runA = COMPACT_SEG_BASE + 0 * COMPACT_EPOCH_STRIDE  # epoch 0, old
    runB = COMPACT_SEG_BASE + 1 * COMPACT_EPOCH_STRIDE  # epoch 1, new
    s0, s1 = STREAM_SEG_BASE + 5, STREAM_SEG_BASE + 9
    sizes = {runA: 2, runB: 8, s0: 5, s1: 5}

    # the bug shape: A is the smallest input but must NOT be merged
    # while B stays live
    sel = _tiered_select([runA, runB, s0, s1], sizes, 2)
    assert len(sel) == 2
    assert not (runA in sel and runB not in sel)
    # streams must come oldest-first: s1 never without s0
    assert not (s1 in sel and s0 not in sel)

    # with room for both runs, merging them together is legal
    sel3 = _tiered_select([runA, runB, s0, s1], sizes, 3)
    assert len(sel3) == 3
    assert not (runA in sel3 and runB not in sel3)

    # batch segments only when the ENTIRE compact range is selected
    sizes2 = {0: 1, 1: 1, runA: 2, runB: 50, s0: 5}
    sel_b = _tiered_select([0, 1, runA, runB, s0], sizes2, 3)
    if any(s < COMPACT_SEG_BASE for s in sel_b):
        assert runA in sel_b and runB in sel_b


def test_duplicate_order_survives_tiered_runs(spark, tmp_index_dir):
    """End-to-end advisor repro: a re-ingested doc whose versions span
    an OLD compact run and a NEWER one must keep creation order (v1's
    docmap row before v2's in seg-id order) after a tiered pass where
    the old run is the smallest live input."""
    import os

    from chearch_spark.streaming.compact import compact_stream_segments

    out = tmp_index_dir
    X = 7000

    def _ingest(batch_id, rows):
        ingest_batch(
            spark.createDataFrame(
                pd.DataFrame(rows, columns=["doc_id", "text"])
            ),
            out, batch_id=batch_id, num_segments=1,
        )

    def _live_runs():
        dead = replaced_seg_ids(out)
        return sorted(
            s
            for s in _seg_files(os.path.join(out, "segments"))
            if s not in dead and COMPACT_SEG_BASE <= s
            and s < 1 << 30
        )

    def _x_copies_in_order():
        import pyarrow.dataset as ds

        dm = (
            ds.dataset(os.path.join(out, "docmap"), format="parquet")
            .to_table(columns=["doc_id", "seg_id", "doc_index", "sha256"])
            .to_pandas()
        )
        dead = replaced_seg_ids(out)
        copies = dm[(dm.doc_id == X) & (~dm.seg_id.isin(list(dead)))]
        return list(
            copies.sort_values(["seg_id", "doc_index"])["sha256"]
        )

    from chearch_spark.spec import content_sha256

    want = [
        content_sha256("version one body"),
        content_sha256("version two body"),
    ]

    # run A (epoch 0, 2 docs — the SMALLEST live input): holds X v1
    # (two one-doc batches: a single live segment is a compact no-op)
    _ingest(0, [(X, "version one body")])
    _ingest(1, [(1, "filler a")])
    compact_stream_segments(spark, out, num_segments=1)
    # run B (epoch 1, 3 docs): holds X v2 — compacted from fresh
    # streams only (the oldest-stream prefix, 3 docs, beats any
    # run-suffix option, 4+ docs, so A stays out)
    _ingest(2, [(X, "version two body"), (2, "filler b")])
    _ingest(3, [(3, "filler c")])
    compact_stream_segments(spark, out, num_segments=1, max_inputs=2)
    runs = _live_runs()
    assert len(runs) == 2, f"expected two live runs, got {runs}"
    assert _x_copies_in_order() == want

    # the advisor's bug pass: run A (2 docs) is the smallest input;
    # size-only selection would merge {A, S} past the newer run B,
    # re-homing v1 ABOVE v2.  The age-safe selection must leave A
    # alone whenever B stays live.
    _ingest(4, [(4, "filler d"), (5, "filler e")])
    _ingest(5, [(6, "filler f"), (7, "filler g")])
    compact_stream_segments(spark, out, num_segments=1, max_inputs=2)
    assert set(runs) <= set(_live_runs()), "old run merged past newer"
    assert _x_copies_in_order() == want

    # a pass WIDE enough to take both runs may re-home them together —
    # creation order must still hold in the merged output
    compact_stream_segments(spark, out, num_segments=1, max_inputs=3)
    finalize_index(spark, out)
    assert _x_copies_in_order() == want
