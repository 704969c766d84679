"""Block-max WAND pruning on a ZIPFIAN-df corpus (round-3 verdict
task 5): the synthetic contract corpus has a tiny vocabulary where hot
terms match most docs and upper bounds rarely separate from true
scores, so BENCH.md's 1.55x understates the win.  A realistic code
corpus has Zipf-distributed document frequencies; this bench builds
one (seeded, reproducible), constructs per-term postings + block-max
metadata EXACTLY as build.py does (POSTING_BLOCK groups of
(last_doc, max_tf, min_len)), and sweeps 4-term OR queries across df
decades, reporting the pruned fraction and speedup vs posting length.

Kernel-level by design: `wand_or_topk` IS the per-segment scoring
kernel `Index.local_search`/`search` run — measuring it directly
removes the parquet/IPC noise floor from a curve that is about
algorithmic skipping.  Results are asserted rank-identical to
exhaustive scoring at every point.

Usage: python scripts/bench_wand_zipf.py  (solo; prints a markdown
table + one JSON line)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from chearch_spark import spec  # noqa: E402
from chearch_spark.operators.wand import (  # noqa: E402
    local_topk_scores,
    wand_or_topk,
)

N_DOCS = 400_000
DOC_LEN = 80
VOCAB = 60_000
ZIPF_A = 1.25
K = 10
TRIALS = 3


def build_corpus(rng):
    """(postings, blocks, dfs, doc_lens): Zipf-rank term draws per doc,
    aggregated to sorted per-term posting arrays with tf counts, plus
    block-max triples per POSTING_BLOCK entries — the build kernel's
    layout (build.py:208-236)."""
    draws = rng.zipf(ZIPF_A, size=N_DOCS * DOC_LEN)
    terms = (draws - 1) % VOCAB  # fold the unbounded Zipf tail
    docs = np.repeat(np.arange(N_DOCS, dtype=np.int64), DOC_LEN)
    # (term, doc) -> tf
    key = terms.astype(np.int64) * N_DOCS + docs
    uniq, tf = np.unique(key, return_counts=True)
    t_of = (uniq // N_DOCS).astype(np.int64)
    d_of = (uniq % N_DOCS).astype(np.int64)
    # group by term (uniq is sorted by key = term-major, doc asc within)
    t_bounds = np.searchsorted(t_of, np.arange(VOCAB + 1))
    doc_lens = np.full(N_DOCS, DOC_LEN, dtype=np.int64)
    B = spec.POSTING_BLOCK
    postings = {}
    blocks = {}
    dfs = np.diff(t_bounds)
    for t in range(VOCAB):
        lo, hi = t_bounds[t], t_bounds[t + 1]
        if lo == hi:
            continue
        pd_, pt_ = d_of[lo:hi], tf[lo:hi]
        postings[t] = (pd_, pt_)
        nb = (len(pd_) + B - 1) // B
        pad = nb * B - len(pd_)
        tf_p = np.pad(pt_, (0, pad)).reshape(nb, B)
        d_p = np.pad(pd_, (0, pad), constant_values=pd_[-1]).reshape(nb, B)
        last_doc = d_p[:, -1]
        max_tf = tf_p.max(axis=1)
        # doc lens constant here; min_len still shaped as build's
        min_len = np.full(nb, DOC_LEN, dtype=np.int64)
        blocks[t] = (last_doc, max_tf, min_len)
    return postings, blocks, dfs, doc_lens


def exhaustive_or_topk(postings, idfs, doc_lens, avgdl, k):
    """Score EVERY candidate (the no-WAND baseline), same formulas."""
    all_docs = np.unique(np.concatenate([p[0] for p in postings]))
    scores = np.zeros(len(all_docs), dtype=np.float64)
    dl = doc_lens[all_docs].astype(np.float64)
    denom_norm = spec.BM25_K1 * (1.0 - spec.BM25_B + spec.BM25_B * dl / avgdl)
    for (docs, tfs), idf in zip(postings, idfs):
        ix = np.searchsorted(docs, all_docs)
        ix_c = np.minimum(ix, len(docs) - 1)
        hit = docs[ix_c] == all_docs
        tf = np.where(hit, tfs[ix_c], 0).astype(np.float64)
        scores += np.where(
            hit, idf * tf * (spec.BM25_K1 + 1.0) / (tf + denom_norm), 0.0
        )
    return local_topk_scores(all_docs, scores, k)


def pick_terms(dfs, target, n):
    """n distinct terms with df nearest the target."""
    order = np.argsort(np.abs(dfs - target))
    picked = [int(t) for t in order if dfs[t] > 0][:n]
    return picked


def main():
    rng = np.random.default_rng(42)
    t0 = time.time()
    postings, blocks, dfs, doc_lens = build_corpus(rng)
    avgdl = float(DOC_LEN)
    print(
        f"corpus: {N_DOCS} docs x {DOC_LEN} tokens, vocab {VOCAB}, "
        f"Zipf a={ZIPF_A}, built in {time.time() - t0:.1f}s",
        file=sys.stderr,
    )
    print(
        f"df deciles: {np.percentile(dfs[dfs > 0], [50, 90, 99, 99.9, 100]).astype(int).tolist()}",
        file=sys.stderr,
    )

    rows = []
    for target in (100, 1_000, 10_000, 100_000, 300_000):
        terms = pick_terms(dfs, target, 4)
        q_post = [postings[t] for t in terms]
        q_blocks = [blocks[t] for t in terms]
        idfs = [spec.idf(N_DOCS, int(dfs[t])) for t in terms]
        mean_df = int(np.mean([dfs[t] for t in terms]))

        t_exh = min(
            _timeit(
                lambda: exhaustive_or_topk(
                    q_post, idfs, doc_lens, avgdl, K
                )
            )
            for _ in range(TRIALS)
        )
        stats = {}
        t_wand = min(
            _timeit(
                lambda: wand_or_topk(
                    q_post, q_blocks, idfs, doc_lens, avgdl, K,
                    stats_out=stats,
                )
            )
            for _ in range(TRIALS)
        )
        want = exhaustive_or_topk(q_post, idfs, doc_lens, avgdl, K)
        got = wand_or_topk(
            q_post, q_blocks, idfs, doc_lens, avgdl, K
        )
        assert got[0].tolist() == want[0].tolist(), (target, "rank")
        assert np.allclose(got[1], want[1]), (target, "score")
        pruned = 1.0 - stats["scored"] / max(stats["candidates"], 1)
        rows.append(
            {
                "target_df": target,
                "mean_df": mean_df,
                "candidates": stats["candidates"],
                "scored": stats["scored"],
                "pruned_pct": round(100 * pruned, 1),
                "t_exhaustive_ms": round(t_exh * 1e3, 2),
                "t_wand_ms": round(t_wand * 1e3, 2),
                "speedup": round(t_exh / t_wand, 2),
            }
        )

    print("| mean df | candidates | scored | pruned % | exhaustive ms | WAND ms | speedup |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['mean_df']:,} | {r['candidates']:,} | {r['scored']:,} "
            f"| {r['pruned_pct']} | {r['t_exhaustive_ms']} "
            f"| {r['t_wand_ms']} | {r['speedup']}x |"
        )
    print(json.dumps({"rows": rows}))


def _timeit(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
