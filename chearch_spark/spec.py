"""Pinned engine specification (SURVEY.md §7.0, FIXTURES.md F4).

Single source of truth shared by the distributed engine
(:mod:`chearch_spark.build` / :mod:`chearch_spark.search`) and the
single-node oracle (:mod:`chearch_spark.oracle`).  The reference
(briangu/chearch) is string-free and score-free, so everything here is a
*pinned extension spec*: tokenizer, BM25 constants, tie-break, and the
parity-mode semantics transcribed from the reference
(`operands.chpl:52-160`, `documentid.chpl:22`, `README.md:109-124`).
"""

from __future__ import annotations

import hashlib
import math
import re

# --- Tokenizer ---------------------------------------------------------
# lowercase; split on runs of anything outside [a-z0-9_]; drop empties.
# Code-friendly (keeps identifiers like `foo_bar2` whole).
TOKEN_SPLIT_RE = r"[^a-z0-9_]+"
# positive form of the same alphabet (the build kernel's findall and
# any extractor-style consumer MUST use this, never a local literal —
# a drifted alphabet would index terms queries can never probe)
TOKEN_RE = r"[a-z0-9_]+"
_TOKEN_SPLIT = re.compile(TOKEN_SPLIT_RE)

# 8-bit textLocation in the reference (`documentid.chpl:22`, README.md:36):
# only positions 0..MAX_POSITION are recorded.  BM25 tf counts ALL
# occurrences (uncapped); parity mode sees only recorded positions.
MAX_POSITION = 255

# --- BM25 (Robertson) --------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75

# --- Top-k -------------------------------------------------------------
# Deterministic total order so ranks are identical across parallelism
# levels: (score desc, doc_id asc).
DEFAULT_K = 10

# --- Posting-list layout -----------------------------------------------
# docIDs sorted ascending -> delta -> LEB128 varint; tfs -> varint.
# Postings are split into fixed blocks carrying block-max metadata for
# WAND pruning (the geometric-block idea from `memorysegment.chpl:152-155`
# reborn as scoring blocks, SURVEY §4.2).
POSTING_BLOCK = 128

# --- Term -> segments directory ------------------------------------------
# The dictionary merge already aggregates one pre-aggregated row per
# (segment, term); collecting the segment ids per term alongside df/cf
# gives EXACT segment pruning for free (same shuffle, same probe read).
# Lists are stored only for terms in <= this many segments: a hot term
# is in (nearly) every segment, so its list carries no pruning value
# and would cost O(num_segments) storage per such term — NULL means
# "assume everywhere".
DICT_SEGS_CAP = 4096

# --- Exact n-gram Jaccard ----------------------------------------------
# Pinned hot-shingle cap: shingles present in more than this many
# documents (boilerplate headers, license blocks) are excluded from the
# exact-Jaccard shingle sets.  A shingle of document frequency f
# contributes f^2 rows to the shared-shingle join, so without the cap a
# boilerplate corpus turns the exact verifier quadratic; with it the
# join is bounded at (cap x df) rows per shingle.  The cap is part of
# the operator's SEMANTICS (Jaccard over df <= cap shingles), mirrored
# verbatim in the DuckDB oracle.
NGRAM_MAX_SHINGLE_DF = 256

# --- ANN quality floors --------------------------------------------------
# Regression tripwires for the approximate paths, asserted by pytest on
# the synthetic testdata embeddings (500 vectors, 10 planted clusters):
# a parameter change (plane count, band layout, n_probe, quantizer
# seed) that silently craters recall must fail CI, not ship.  Measured
# on 2026-08-16: LSH mean recall 0.36 (sf0.001) / 0.58 (sf0.01); IVF
# k-means n_probe=4 0.87; IVF-flat 0.92 — floors sit ~0.05-0.15 below
# the measured values (tripwire, not a quality target).
LSH_RECALL_FLOOR = 0.30
IVF_RECALL_FLOOR = 0.70
# PQ (m=16, 64 codes; r5): seed-codebook mean recall@10 measured
# 0.43-0.58 (per-query min 0.30), k-means-trained 0.52-0.63 (min
# 0.40) across sf0.001/0.01/0.1 — random-ish synthetic embeddings are
# PQ's worst case (no cluster structure for the codebooks to exploit)
PQ_SEED_RECALL_FLOOR = 0.30
PQ_RECALL_FLOOR = 0.40
# IVFADC+R (r6): ADC shortlist R=4k exact-reranked from the vectors/
# sidecar — mean recall@10 measured 0.91 (sf0.001/0.01, residual and
# plain codes alike; ceiling is the n_probe=8/16 probe recall 0.925).
# The floor sits below the measured band per the tripwire convention.
IVFADC_RERANK_RECALL_FLOOR = 0.80
# SQ8 (per-dimension 8-bit, r5): mean recall@10 measured 0.96-1.0
# (per-query min 0.9) across sf0.001/0.01/0.1 — scalar quantization
# keeps per-dimension resolution, so it barely moves the ranking
SQ_RECALL_FLOOR = 0.80

SPEC_VERSION = "1"


def tokenize(text: str) -> list[str]:
    """Reference tokenizer: lowercase, split, drop empties.

    Pinned semantics note: the engine lowers with Python str.lower(),
    the JVM expressions with Java lower(), and the oracles with
    DuckDB's lower(); these agree on ASCII (the pinned token alphabet
    [a-z0-9_]) but can differ on exotic case mappings (e.g. U+0130).
    Since non-[a-z0-9_] characters are separators regardless of how
    they lower, tokens themselves are engine-identical; only corpora
    relying on non-ASCII case FOLDING producing ASCII letters would
    diverge, and the pinned spec does not support those."""
    if not text:
        return []
    return [t for t in _TOKEN_SPLIT.split(text.lower()) if t]


def normalize_term(term: str) -> str:
    """Normalize a user-supplied query term through the tokenizer.
    Raises ValueError when the string is not exactly one token."""
    toks = tokenize(term)
    if len(toks) != 1:
        raise ValueError(
            f"query term {term!r} tokenizes to {len(toks)} tokens; "
            "each Term() must be a single token"
        )
    return toks[0]


def idf(n_docs: int, df: int) -> float:
    """Pinned idf: ln(1 + (N - df + 0.5)/(df + 0.5)), float64."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(tf: float, doc_len: float, avgdl: float, idf_t: float) -> float:
    """Per-(term, doc) BM25 contribution with the pinned constants."""
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * doc_len / avgdl)
    return idf_t * tf * (BM25_K1 + 1.0) / denom


def content_sha256(text: str) -> str:
    """Per-row invariant recorded in the docmap (north rule)."""
    return hashlib.sha256((text or "").encode("utf-8")).hexdigest()


def content_fp(shas) -> int:
    """Order-independent content fingerprint over sha256 hex digests
    (per-segment and global lineage identity; pinned here so the
    builder, streaming ingest, and the fsck cannot drift)."""
    return sum(int(s[:16], 16) for s in shas) % (2**63)
