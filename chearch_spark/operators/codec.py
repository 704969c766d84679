"""Vectorized posting-list codec: delta + LEB128 varint (numpy).

The reference stores postings as bit-packed uint32 blocks in pooled
banks (`documentidpool.chpl:26-35`, `memorysegment.chpl:152-232`).
Our on-disk segment format instead compresses sorted doc indexes as
delta + varint into a parquet ``binary`` column (north rule).  All
kernels are numpy-vectorized — no per-element Python in the hot path.

Round-trip tested property-style over edge values, mirroring the
reference's exhaustive codec tests (`test/chearch_test.chpl:6-45`).
"""

from __future__ import annotations

import numpy as np

_U64_7 = np.uint64(7)
_U64_7F = np.uint64(0x7F)


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (≤ uint64)."""
    return encode_varints_with_lengths(values)[0]


def encode_varints_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode; also return per-value byte lengths so callers can
    split one encoded stream at group boundaries (segment builder does
    one encoder call per column for the whole segment)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    # Max 10 LEB128 bytes per uint64; build an (n,10) byte matrix then
    # flatten row-wise through a length mask. Vectorized over n.
    mat = np.zeros((n, 10), dtype=np.uint8)
    lengths = np.ones(n, dtype=np.int64)
    rem = v.copy()
    for i in range(10):
        b7 = (rem & _U64_7F).astype(np.uint8)
        rem = rem >> _U64_7
        more = rem > 0
        mat[:, i] = np.where(more, b7 | np.uint8(0x80), b7)
        if i > 0:
            # only rows still active at this byte get it counted
            lengths = np.where(active, i + 1, lengths)
        active = more if i == 0 else (active & more)
        if not active.any():
            break
    mask = np.arange(10)[None, :] < lengths[:, None]
    return mat[mask].tobytes(), lengths


def decode_varints(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_varints` -> uint64 array.

    Raises ValueError on a truncated/corrupt stream (trailing
    continuation byte) instead of surfacing a numpy IndexError from
    deep inside a query kernel."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    if not is_end[-1]:
        raise ValueError(
            "truncated varint stream (ends on a continuation byte)"
        )
    n = int(is_end.sum())
    # value index per byte: 0,0,..,1,1,.. (increments after each end byte)
    val_idx = np.zeros(b.size, dtype=np.int64)
    val_idx[1:] = np.cumsum(is_end[:-1])
    # byte position within its value
    end_pos = np.flatnonzero(is_end)
    starts = np.concatenate(([0], end_pos[:-1] + 1))
    pos_in_val = np.arange(b.size) - starts[val_idx]
    out = np.zeros(n, dtype=np.uint64)
    shifted = (b & np.uint8(0x7F)).astype(np.uint64) << (
        pos_in_val.astype(np.uint64) * _U64_7
    )
    np.add.at(out, val_idx, shifted)
    return out


def encode_postings(doc_indexes: np.ndarray) -> bytes:
    """Sorted-ascending doc indexes -> delta (first kept raw) -> varint."""
    d = np.ascontiguousarray(doc_indexes, dtype=np.uint64)
    if d.size == 0:
        return b""
    deltas = np.empty_like(d)
    deltas[0] = d[0]
    np.subtract(d[1:], d[:-1], out=deltas[1:])
    return encode_varints(deltas)


def decode_postings(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_postings` -> sorted uint64 doc indexes."""
    deltas = decode_varints(buf)
    if deltas.size == 0:
        return deltas
    return np.cumsum(deltas, dtype=np.uint64)
