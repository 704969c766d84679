"""Deterministic, engine-portable hashing primitives.

Everything in the dedup / fingerprint / LSH stack hashes through ONE
primitive: ``md5_long`` — the first 15 hex chars (60 bits) of md5,
parsed as a non-negative int64.  md5 is bit-identical everywhere, so
the same value is computable

* JVM-side in Spark (``conv(substring(md5(x), 1, 15), 16, 10)``) —
  whole-stage codegen, no Python in the hot path, and
* in DuckDB oracle SQL (``CAST('0x' || substr(md5(x), 1, 15) AS
  BIGINT)``),

which is what makes every dedup operator in this package verifiable by
the driver's value-hash gate (row-for-row equality with an independent
engine), unlike e.g. ``xxhash64``/``hash()`` whose implementations
differ across engines.

The reference engine hashes terms with a murmur3 finalizer
(`genhashkey32.chpl:7-18`) purely for hash-table placement; here
hashing is *semantic* (MinHash/SimHash values), so cross-engine
determinism matters more than the 5-op finalizer's speed.

Universal-hash family for MinHash: ``h_i(x) = (a_i * (x % PM) + b_i)
% PM`` over the Mersenne prime ``PM = 2^31 - 1``.  ``a_i``/``b_i`` are
pinned constants derived from md5 of a fixed seed string — auditable,
platform-independent, no RNG state.  All arithmetic stays < 2^62, so
int64 never overflows on either engine.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: (a * x' + b) with a, x' < PM stays < 2^62.
PM = 2_147_483_647

# Modulus for positional document fingerprints (fits comfortably so
# per-element products stay < 2^63 even for billion-token documents).
P_FP = 1_000_000_007


def _pin(label: str, mod: int, lo: int = 0) -> int:
    """Pinned pseudo-random constant: md5(label) -> int in [lo, mod)."""
    h = int(hashlib.md5(label.encode()).hexdigest()[:15], 16)
    return lo + h % (mod - lo)


# 16 minhash permutations -> 8 bands x 2 rows (LSH banding).  The
# collision threshold of (b, r) banding is ~(1/b)^(1/r) = 0.35, tuned
# for near-dup detection at Jaccard >= ~0.5 (recall ~0.90 at J = 0.5,
# ~0.996 at J = 0.7, while J <= 0.2 pairs collide < 28% of the time
# and are discarded by exact verification anyway).
NUM_MINHASH = 16
MINHASH_BANDS = 8
MINHASH_ROWS = 2
MINHASH_A = [_pin(f"chearch-minhash-a-{i}", PM, 1) for i in range(NUM_MINHASH)]
MINHASH_B = [_pin(f"chearch-minhash-b-{i}", PM) for i in range(NUM_MINHASH)]

# SimHash width: 48 bits keeps every signature, band value and xor
# positive in int64 on both engines (bit 63 would flip the sign).
SIMHASH_BITS = 48
SIMHASH_BANDS = 4  # 4 x 12-bit bands: pigeonhole-exact for hamming <= 3
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS


# --- Spark (JVM) side ---------------------------------------------------

def md5_long(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative long (JVM-side)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def minhash_col(x_mod: Column, i: int) -> Column:
    """i-th universal hash over a pre-reduced value (x % PM)."""
    return (F.lit(MINHASH_A[i]) * x_mod + F.lit(MINHASH_B[i])) % F.lit(PM)


# --- DuckDB (oracle SQL) side -------------------------------------------

def md5_long_sql(expr: str) -> str:
    """DuckDB fragment computing the same value as :func:`md5_long`."""
    return f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15) AS BIGINT)"


def minhash_sql(x_mod_expr: str, i: int) -> str:
    return f"(({MINHASH_A[i]} * {x_mod_expr} + {MINHASH_B[i]}) % {PM})"


def py_md5_long(s: str) -> int:
    """Python mirror (oracle/unit tests)."""
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)
