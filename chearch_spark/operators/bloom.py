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


def _raw_chain(term: str) -> list[int]:
    """K raw 64-bit hash values from ONE md5 digest via a splitmix64
    chain seeded by the digest's first 64 bits.  (A 16-byte digest
    cannot supply 7 independent 4-byte words, and Kirsch-Mitzenmacher
    double hashing clusters when gcd(h2, m) > 1 — m is a composite
    multiple of the term count here; the mixed chain keeps the
    theoretical FP rate at any m.)  Independent of the filter size m,
    so the chain is computed once per term and reduced modulo each
    segment's m (``BloomProbe``)."""
    d = hashlib.md5(term.encode("utf-8")).digest()
    x = int.from_bytes(d[:8], "big")
    out = []
    for _ in range(K):
        x = (x + 0x9E3779B97F4A7C15) & _M64
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
        z ^= z >> 31
        out.append(z)
    return out


def _positions(term: str, m: int) -> list[int]:
    """K bit positions for a filter of m bits."""
    return [z % m for z in _raw_chain(term)]


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


class BloomProbe:
    """Vectorized membership testing across MANY segment blooms.

    The per-query cost of the naive loop — ``np.unpackbits`` on every
    filter plus K python hash iterations per (term, segment) — grows
    linearly in segments and defeats the pruning at the design's own
    ~500k-segment scale.  This probe is built ONCE per index:

    * the packed filter bytes are concatenated into one uint8 buffer
      (never unpacked — membership tests index bytes directly:
      ``byte[p >> 3] & (128 >> (p & 7))``, matching ``np.packbits``'s
      MSB-first layout);
    * per-term splitmix64 chains (independent of each filter's m) are
      memoized across queries;

    so one query costs a (segments × terms × K) numpy gather — low
    single-digit ms at 10^4 segments, no per-segment Python.  Beyond
    ~10^5 segments, move the probe into a distributed join over the
    blooms parquet (module docstring).
    """

    def __init__(self, blooms: dict[int, tuple[int, bytes]]) -> None:
        self.seg_ids = np.array(sorted(blooms), dtype=np.int64)
        self.seg_set = set(int(s) for s in self.seg_ids)
        self.m = np.array(
            [blooms[int(s)][0] for s in self.seg_ids], dtype=np.uint64
        )
        bufs = [
            np.frombuffer(blooms[int(s)][1], dtype=np.uint8)
            for s in self.seg_ids
        ]
        self.offsets = np.concatenate(
            ([0], np.cumsum([len(b) for b in bufs], dtype=np.int64))
        )
        self.buf = (
            np.concatenate(bufs) if bufs else np.zeros(0, dtype=np.uint8)
        )
        self._chains: dict[str, np.ndarray] = {}

    def _chain(self, term: str) -> np.ndarray:
        z = self._chains.get(term)
        if z is None:
            z = np.array(_raw_chain(term), dtype=np.uint64)
            self._chains[term] = z
        return z

    def contains(self, terms: list[str]) -> np.ndarray:
        """(n_segments, n_terms) bool membership matrix."""
        n_seg = len(self.seg_ids)
        if n_seg == 0 or not terms:
            return np.zeros((n_seg, len(terms)), dtype=bool)
        z = np.stack([self._chain(t) for t in terms])  # (T, K)
        pos = z[None, :, :] % self.m[:, None, None]  # (S, T, K)
        byte_ix = self.offsets[:-1][:, None, None] + (pos >> 3).astype(
            np.int64
        )
        mask = np.uint8(128) >> (pos & 7).astype(np.uint8)
        return (self.buf[byte_ix] & mask != 0).all(axis=2)

    def candidates(self, terms: list[str], require_all: bool) -> list[int]:
        has = self.contains(terms)
        keep = has.all(axis=1) if require_all else has.any(axis=1)
        return [int(s) for s in self.seg_ids[keep]]


def candidate_segments(
    blooms: dict[int, tuple[int, bytes]],
    terms: list[str],
    require_all: bool,
) -> list[int]:
    """Segment ids that may contain the query: all terms present
    (require_all, pure-AND) or any term present (everything else).
    One-shot form; long-lived callers should hold a :class:`BloomProbe`
    to amortize the buffer concat and term-chain hashing."""
    return BloomProbe(blooms).candidates(terms, require_all)


def read_bloom_map(
    bloom_dir: str, seg_ids=None
) -> dict[int, tuple[int, bytes]]:
    """{seg_id: (m, filter bytes)} from the blooms parquet — THE one
    decode shared by the driver-resident probes (full and restricted).

    Blooms are published as one file per segment named by its id
    (``build.bloom_file_path``), so a restricted read opens EXACTLY
    the |seg_ids| files it needs — no directory-wide footer scan.
    Ids not found as per-segment files fall back to a filtered dataset
    scan over the remaining (legacy grouped) files."""
    import os

    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    if not (os.path.isdir(bloom_dir) and os.listdir(bloom_dir)):
        return {}

    def _rows_to_map(t) -> dict[int, tuple[int, bytes]]:
        return {
            int(s): (int(m), bytes(b))
            for s, m, b in zip(
                t.column("seg_id").to_pylist(),
                t.column("bloom_m").to_pylist(),
                t.column("bloom").to_pylist(),
            )
        }

    if seg_ids is None:
        return _rows_to_map(
            ds.dataset(bloom_dir, format="parquet").to_table()
        )

    out: dict[int, tuple[int, bytes]] = {}
    missing = []
    for s in seg_ids:
        p = os.path.join(bloom_dir, f"bloom-{int(s):010d}.parquet")
        if os.path.exists(p):
            out.update(_rows_to_map(pq.read_table(p)))
        else:
            missing.append(int(s))
    if missing:
        legacy = [
            os.path.join(bloom_dir, fn)
            for fn in os.listdir(bloom_dir)
            if fn.endswith(".parquet") and not fn.startswith("bloom-")
        ]
        if legacy:
            t = ds.dataset(legacy, format="parquet").to_table(
                filter=ds.field("seg_id").isin(missing)
            )
            out.update(_rows_to_map(t))
    return out


def probe_blooms_spark(
    spark, bloom_dir: str, terms: list[str], require_all: bool,
    seg_ids=None,
) -> tuple[list[int], list[int]]:
    """Distributed bloom probe for indexes whose filters exceed driver
    RAM (the ~10^5-segment design point: 500k filters × a few KB each
    is GBs).  The blooms parquet is scanned by a Spark job; each task
    builds a :class:`BloomProbe` over ITS batch of (seg_id, m, bloom)
    rows and tests the query terms' precomputed splitmix chains.  Only
    ids come back to the driver — (candidate seg ids, all bloomed seg
    ids) — 8 bytes each, never the filter bytes.

    Trade-off vs the driver-resident probe: one Spark job (~0.1-0.5 s
    scheduling) per probe instead of sub-ms — the right trade exactly
    when the index is too big for one machine anyway.  ``Index``
    switches automatically past ``DISTRIBUTED_PROBE_THRESHOLD``.

    ``seg_ids`` restricts the scan to those segments' rows (pushed
    into the parquet read as an In filter — row groups outside it are
    skipped): a caller that only needs the dictionary-uncovered tail
    adjudicated does not pay a scan over every filter ever written.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    terms = list(terms)

    def _kernel(batches):
        for pdf in batches:
            blooms = {
                int(s): (int(m), bytes(b))
                for s, m, b in zip(
                    pdf["seg_id"], pdf["bloom_m"], pdf["bloom"]
                )
            }
            probe = BloomProbe(blooms)
            hits = set(probe.candidates(terms, require_all))
            yield pd.DataFrame(
                {
                    "seg_id": pd.Series(sorted(blooms), dtype="int64"),
                    "hit": pd.Series(
                        [s in hits for s in sorted(blooms)], dtype="bool"
                    ),
                }
            )

    scan = spark.read.parquet(bloom_dir).select(
        "seg_id", "bloom_m", "bloom"
    )
    if seg_ids is not None:
        scan = scan.filter(
            F.col("seg_id").isin([int(s) for s in seg_ids])
        )
    rows = scan.mapInPandas(
        _kernel, "seg_id long, hit boolean"
    ).collect()
    cand = sorted(int(r.seg_id) for r in rows if r.hit)
    bloomed = sorted(int(r.seg_id) for r in rows)
    return cand, bloomed


# Above this many segments, Index probes the blooms distributively
# instead of holding every filter in driver RAM.
DISTRIBUTED_PROBE_THRESHOLD = 100_000
