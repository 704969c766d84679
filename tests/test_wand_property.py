"""Property tests: WAND pruning and the conjunctive pre-filter must be
EXACT — identical results to brute-force scoring on randomized posting
fixtures (Spark-free; pure numpy kernels)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from chearch_spark import spec
from chearch_spark.operators.wand import (
    local_topk_scores,
    prune_conjunctive_blocks,
    wand_or_topk,
)


def _mk_postings(rng, n_docs, n_terms, density):
    doc_lens = rng.integers(5, 200, n_docs).astype(np.int64)
    postings, blocks, idfs = [], [], []
    for _t in range(n_terms):
        mask = rng.random(n_docs) < density
        docs = np.flatnonzero(mask).astype(np.int64)
        tfs = rng.integers(1, 20, len(docs)).astype(np.int64)
        B = spec.POSTING_BLOCK
        nb = (len(docs) + B - 1) // B
        if nb:
            starts = np.arange(nb) * B
            last = docs[np.minimum(starts + B - 1, len(docs) - 1)]
            mtf = np.maximum.reduceat(tfs, starts)
            mlen = np.minimum.reduceat(doc_lens[docs], starts)
            blocks.append((last, mtf, mlen))
        else:
            blocks.append(None)
        postings.append((docs, tfs))
        idfs.append(float(rng.uniform(0.1, 5.0)))
    return postings, blocks, idfs, doc_lens


def _brute_or(postings, idfs, doc_lens, avgdl, k):
    all_docs = np.unique(
        np.concatenate([p[0] for p in postings])
        if postings
        else np.empty(0, np.int64)
    )
    scores = np.zeros(len(all_docs))
    dl = doc_lens[all_docs].astype(float)
    denom_norm = spec.BM25_K1 * (1 - spec.BM25_B + spec.BM25_B * dl / avgdl)
    for (docs, tfs), idf in zip(postings, idfs):
        ix = np.searchsorted(all_docs, docs)
        tf = tfs.astype(float)
        scores[ix] += idf * tf * (spec.BM25_K1 + 1) / (tf + denom_norm[ix])
    return local_topk_scores(all_docs, scores, k)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_docs=st.integers(1, 800),
    n_terms=st.integers(1, 5),
    k=st.integers(1, 20),
)
def test_wand_or_exact_topk(seed, n_docs, n_terms, k):
    rng = np.random.default_rng(seed)
    postings, blocks, idfs, doc_lens = _mk_postings(
        rng, n_docs, n_terms, density=float(rng.uniform(0.05, 0.8))
    )
    avgdl = float(doc_lens.mean())
    got_d, got_s = wand_or_topk(postings, blocks, idfs, doc_lens, avgdl, k)
    want_d, want_s = _brute_or(postings, idfs, doc_lens, avgdl, k)
    assert got_d.tolist() == want_d.tolist()
    np.testing.assert_allclose(got_s, want_s, rtol=0, atol=1e-12)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000), n_terms=st.integers(1, 5))
def test_conjunctive_prefilter_is_exact_intersection(seed, n_terms):
    rng = np.random.default_rng(seed)
    postings, blocks, _idfs, _dl = _mk_postings(
        rng, 500, n_terms, density=float(rng.uniform(0.1, 0.9))
    )
    docs_per_term = [p[0] for p in postings]
    got = prune_conjunctive_blocks(docs_per_term)
    want = docs_per_term[0]
    for d in docs_per_term[1:]:
        want = np.intersect1d(want, d, assume_unique=True)
    assert got.tolist() == want.tolist()


def test_local_topk_tie_break():
    ids = np.array([5, 3, 9, 1], dtype=np.int64)
    scores = np.array([1.0, 1.0, 2.0, 1.0])
    d, s = local_topk_scores(ids, scores, 3)
    assert d.tolist() == [9, 1, 3]  # score desc, then doc_id asc
    assert s.tolist() == [2.0, 1.0, 1.0]


def test_wand_keeps_tied_docs():
    """Regression: uniform tf/doc_len corpus makes every upper bound
    equal the exact score; strict > pruning dropped tied docs and
    broke the (score desc, doc_id asc) tie-break."""
    n = 2000
    docs = np.arange(n, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    doc_lens = np.full(n, 50, dtype=np.int64)
    got_d, got_s = wand_or_topk(
        [(docs, tfs)], [None], [1.5], doc_lens, 50.0, 10
    )
    assert got_d.tolist() == list(range(10))  # smallest doc ids win ties
    assert np.allclose(got_s, got_s[0])


def test_wand_k_zero():
    n = 2000
    docs = np.arange(n, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    doc_lens = np.full(n, 50, dtype=np.int64)
    d, s = wand_or_topk([(docs, tfs)], [None], [1.5], doc_lens, 50.0, 0)
    assert len(d) == 0 and len(s) == 0


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_docs=st.integers(1, 600),
    n_terms=st.integers(1, 5),
    k=st.integers(1, 15),
    del_frac=st.floats(0.0, 0.6),
)
def test_tombstone_exclusion_preserves_wand_exactness(
    seed, n_docs, n_terms, k, del_frac
):
    """Randomized delete sets: dropping tombstoned docs from postings
    (and the block metadata of affected terms, per search._drop_tombstoned)
    must yield EXACTLY the brute-force top-k over the surviving docs —
    the admissibility argument for the block-drop fallback, fuzzed."""
    from chearch_spark.search import _drop_tombstoned

    rng = np.random.default_rng(seed)
    postings, blocks, idfs, doc_lens = _mk_postings(
        rng, n_docs, n_terms, 0.3
    )
    avgdl = float(doc_lens.mean())
    # external ids = doc_index * 7 + 1 (ascending, like a docmap)
    meta_ids = np.arange(n_docs, dtype=np.int64) * 7 + 1
    tomb = np.sort(
        rng.choice(meta_ids, size=int(n_docs * del_frac), replace=False)
    )
    pdict = {f"t{i}": p for i, p in enumerate(postings)}
    bdict = {
        f"t{i}": b for i, b in enumerate(blocks) if b is not None
    }
    fp, fb = _drop_tombstoned(pdict, bdict, meta_ids, tomb)
    terms = [t for t in pdict if len(fp[t][0])]
    got_d, got_s = wand_or_topk(
        [fp[t] for t in terms],
        [fb.get(t) for t in terms],
        [idfs[int(t[1:])] for t in terms],
        doc_lens,
        avgdl,
        k,
    )
    want_d, want_s = _brute_or(
        [fp[t] for t in terms],
        [idfs[int(t[1:])] for t in terms],
        doc_lens,
        avgdl,
        k,
    )
    assert got_d.tolist() == want_d.tolist()
    assert np.allclose(got_s, want_s)
    # nothing tombstoned survives anywhere
    assert not set(meta_ids[got_d]) & set(tomb.tolist())
