"""Per-segment term Bloom filters for segment pruning.

Document-hash partitioning means every query fans out to every segment
(chearch's model, `README.md:17` — and its cost).  At 10^12 files /
~500k segments, even with parquet row-group stats skipping the posting
rows, the scan still opens every segment file's footer.  A small Bloom
filter over each segment's term set (built inside the same kernel that
writes the segment, stored next to the manifest) lets the planner drop
segments that cannot contain the query's terms:

* pure-AND queries prune any segment missing ANY required term — for
  rare-term conjunctions this eliminates almost the whole fan-out;
* all other queries prune segments containing NO query term.

False positives only cost a wasted file open (safe); false negatives
are impossible.  Sizing: ``BITS_PER_TERM = 10`` with ``K = 7`` hashes
gives ~0.9% FP — ~1.25 bytes/term, i.e. a few MB per million-term
segment, read once and cached driver-side (or joined distributively
for very large manifests).

Hashing derives all K positions from one md5 per term (deterministic
everywhere, same pin as :mod:`chearch_spark.functions.hashing`).
"""

from __future__ import annotations

import hashlib

import numpy as np

BITS_PER_TERM = 10
K = 7


_M64 = (1 << 64) - 1


def _positions(term: str, m: int) -> list[int]:
    """K bit positions from ONE md5 digest via a splitmix64 chain
    seeded by the digest's first 64 bits.  (A 16-byte digest cannot
    supply 7 independent 4-byte words, and Kirsch-Mitzenmacher double
    hashing clusters when gcd(h2, m) > 1 — m is a composite multiple
    of the term count here; the mixed chain keeps the theoretical FP
    rate at any m.)"""
    d = hashlib.md5(term.encode("utf-8")).digest()
    x = int.from_bytes(d[:8], "big")
    out = []
    for _ in range(K):
        x = (x + 0x9E3779B97F4A7C15) & _M64
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
        z ^= z >> 31
        out.append(z % m)
    return out


def make_bloom(terms, bits_per_term: int = BITS_PER_TERM) -> tuple[int, bytes]:
    """(m, filter bytes) over an iterable of term strings."""
    terms = list(terms)
    n = max(len(terms), 1)
    m = max(n * bits_per_term, 64)
    bits = np.zeros(m, dtype=bool)
    for t in terms:
        bits[_positions(t, m)] = True
    return m, np.packbits(bits).tobytes()


def _contains_unpacked(bits: np.ndarray, m: int, term: str) -> bool:
    return all(bits[p] for p in _positions(term, m))


def bloom_contains(bloom: bytes, m: int, term: str) -> bool:
    bits = np.unpackbits(np.frombuffer(bloom, dtype=np.uint8))
    return _contains_unpacked(bits, m, term)


def candidate_segments(
    blooms: dict[int, tuple[int, bytes]],
    terms: list[str],
    require_all: bool,
) -> list[int]:
    """Segment ids that may contain the query: all terms present
    (require_all, pure-AND) or any term present (everything else)."""
    out = []
    for seg_id, (m, bloom) in blooms.items():
        bits = np.unpackbits(np.frombuffer(bloom, dtype=np.uint8))
        has = [_contains_unpacked(bits, m, t) for t in terms]
        if (all(has) if require_all else any(has)):
            out.append(seg_id)
    return sorted(out)
