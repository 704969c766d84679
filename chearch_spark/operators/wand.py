"""Local top-k + block-max WAND pruning (SURVEY.md §7.1 P3).

The reference's per-partition early termination is unscored truncation
at ``partitionLimit`` (`search.chpl:17`, `searchindex.chpl:101-107`).
The north rule upgrades this to *scored* local top-k with block-max
pruning: posting lists carry per-block (last_doc, max_tf, min_len)
triples (the geometric-block idea of `memorysegment.chpl:152-155`
reborn as scoring blocks), so a kernel can upper-bound each block's
BM25 contribution and skip blocks that cannot reach the running
threshold (Broder et al. WAND; Ding & Suel block-max WAND — public
literature, see PAPERS.md).

All functions are numpy-vectorized and Spark-free (unit-testable).
"""

from __future__ import annotations

import numpy as np

from chearch_spark import spec


def local_topk_scores(
    ext_ids: np.ndarray, scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic local top-k: (score desc, doc_id asc).

    Uses argpartition to avoid a full sort when the candidate set is
    large; keeps score-ties at the boundary so the tie-break can pick
    the smaller doc_id (rank identity across parallelism levels).
    """
    n = len(scores)
    if n == 0 or k <= 0:
        return ext_ids[:0], scores[:0]
    if n > max(4 * k, 64) and k < n:
        thresh = np.partition(scores, n - k)[n - k]
        keep = scores >= thresh  # >= keeps boundary ties for tie-break
        ext_ids, scores = ext_ids[keep], scores[keep]
    order = np.lexsort((ext_ids, -scores))[:k]
    return ext_ids[order], scores[order]


def block_upper_bounds(
    max_tf: np.ndarray, min_len: np.ndarray, idf_t: float, avgdl: float
) -> np.ndarray:
    """Per-block BM25 upper bound: the term score is increasing in tf
    and decreasing in doc length, so f(max_tf, min_len) bounds every
    doc in the block."""
    tf = max_tf.astype(np.float64)
    dl = min_len.astype(np.float64)
    denom = tf + spec.BM25_K1 * (1.0 - spec.BM25_B + spec.BM25_B * dl / avgdl)
    return idf_t * tf * (spec.BM25_K1 + 1.0) / denom


def prune_conjunctive_blocks(
    docs_per_term: list[np.ndarray],
) -> np.ndarray:
    """Exact n-ary intersection, rarest-term-driven: membership of the
    rarest term's doc ids is checked against every other posting list
    via vectorized searchsorted (O(r log n) — the block structure adds
    nothing once membership is this cheap, so no block metadata is
    consulted).  The vectorized realization of the reference's
    smaller-list-first intent (`docs/Feature notes.txt`)."""
    if not docs_per_term or any(len(d) == 0 for d in docs_per_term):
        return np.empty(0, dtype=np.int64)
    rare_i = int(np.argmin([len(d) for d in docs_per_term]))
    rare_docs = docs_per_term[rare_i]
    keep = np.ones(len(rare_docs), dtype=bool)
    for j, docs in enumerate(docs_per_term):
        if j == rare_i:
            continue
        # candidate must exist in every other term's posting range;
        # searchsorted membership handles this exactly and vectorized —
        # block structure only helps when lists are huge, in which case
        # membership via searchsorted is already O(r log n)
        ix = np.searchsorted(docs, rare_docs)
        ix_c = np.minimum(ix, len(docs) - 1)
        keep &= docs[ix_c] == rare_docs
    return rare_docs[keep]


def wand_or_topk(
    postings: list[tuple[np.ndarray, np.ndarray]],  # (docs, tfs) per term
    blocks: list[tuple[np.ndarray, np.ndarray, np.ndarray] | None],
    idfs: list[float],
    doc_lens: np.ndarray,
    avgdl: float,
    k: int,
    stats_out: dict | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND for pure disjunctions: returns (doc_index, score)
    of the local top-k without scoring every candidate.

    Strategy (vectorized, block granularity): compute each term's
    per-block upper bound; a doc's total upper bound is the sum of the
    bounds of the blocks covering it.  Blocks whose *sum of term
    bounds* cannot beat the running threshold θ (the kth best true
    score so far, seeded by exactly scoring the best-bound block region
    first) are skipped entirely.

    ``stats_out`` (a dict, mutated in place) records pruning telemetry
    — ``candidates`` (union doc count) and ``scored`` (docs scored
    exactly) — for benchmarks/diagnostics; scoring is unaffected.
    """
    nt = len(postings)
    if nt == 0 or k <= 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)

    # per-term per-block ubs; map every doc to its block ub per term
    def term_doc_ubs(i: int) -> np.ndarray:
        docs, _ = postings[i]
        if blocks[i] is None:
            # fall back: exact tf-based bound per doc
            tfs = postings[i][1]
            return block_upper_bounds(
                tfs, doc_lens[docs], idfs[i], avgdl
            )
        last_doc, max_tf, min_len = blocks[i]
        ub = block_upper_bounds(max_tf, min_len, idfs[i], avgdl)
        # block index of each posting entry (fixed POSTING_BLOCK width)
        bi = np.arange(len(docs)) // spec.POSTING_BLOCK
        return ub[bi]

    # union of docs with summed upper bounds
    all_docs = np.unique(np.concatenate([p[0] for p in postings]))
    if len(all_docs) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    ub_sum = np.zeros(len(all_docs), dtype=np.float64)
    for i in range(nt):
        docs = postings[i][0]
        if len(docs) == 0:
            continue
        pos = np.searchsorted(all_docs, docs)
        ub_sum[pos] += term_doc_ubs(i)

    # exact scorer for a candidate subset
    def exact(cand: np.ndarray) -> np.ndarray:
        scores = np.zeros(len(cand), dtype=np.float64)
        dl = doc_lens[cand].astype(np.float64)
        denom_norm = spec.BM25_K1 * (
            1.0 - spec.BM25_B + spec.BM25_B * dl / avgdl
        )
        for i in range(nt):
            docs, tfs = postings[i]
            if len(docs) == 0:
                continue
            ix = np.searchsorted(docs, cand)
            ix_c = np.minimum(ix, max(len(docs) - 1, 0))
            hit = docs[ix_c] == cand
            tf = np.where(hit, tfs[ix_c], 0).astype(np.float64)
            scores += np.where(
                hit,
                idfs[i] * tf * (spec.BM25_K1 + 1.0) / (tf + denom_norm),
                0.0,
            )
        return scores

    if len(all_docs) <= max(4 * k, 256):
        if stats_out is not None:
            stats_out["candidates"] = int(len(all_docs))
            stats_out["scored"] = int(len(all_docs))
        scores = exact(all_docs)
        return local_topk_scores(all_docs, scores, k)

    # seed θ with the top-(4k) docs by upper bound, scored exactly
    seed_n = min(4 * k, len(all_docs))
    seed_ix = np.argpartition(-ub_sum, seed_n - 1)[:seed_n]
    seed_docs = np.sort(all_docs[seed_ix])
    seed_scores = exact(seed_docs)
    top_docs, top_scores = local_topk_scores(seed_docs, seed_scores, k)
    theta = top_scores[-1] if len(top_scores) == k else -np.inf

    # prune: only docs whose ub beats θ need exact scoring
    remaining = np.ones(len(all_docs), dtype=bool)
    remaining[seed_ix] = False
    # >= not >: docs whose upper bound TIES theta may have exact score
    # == theta and win the (score desc, doc_id asc) tie-break — pruning
    # them would break rank-identity with the exhaustive path/oracle
    need = remaining & (ub_sum >= theta)
    if stats_out is not None:
        stats_out["candidates"] = int(len(all_docs))
        stats_out["scored"] = int(seed_n + need.sum())
    if need.any():
        cand = all_docs[need]
        scores = exact(cand)
        merged_docs = np.concatenate([top_docs, cand])
        merged_scores = np.concatenate([top_scores, scores])
        top_docs, top_scores = local_topk_scores(merged_docs, merged_scores, k)
    return top_docs, top_scores
