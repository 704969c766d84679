"""Bit-parity tests for the reference term hash
(`genhashkey32.chpl:7-31` — MurmurHash3 fmix32 over a djb2-xor fold).

fmix32 known-answer vectors come from the published MurmurHash3_x86_32
test vectors: for empty input, murmur3_32("", seed) = fmix32(seed ^ 0),
so fmix32(1) = 0x514E28B7 and fmix32(0xFFFFFFFF) = 0x81F16F39 are
independent ground truth (smhasher, public domain).
"""

import numpy as np

from chearch_spark.functions.murmur import (
    fmix32,
    gen_hash_key32,
    gen_hash_key32_batch,
    reference_bucket,
)


def test_fmix32_known_vectors():
    assert fmix32(0) == 0
    assert fmix32(1) == 0x514E28B7
    assert fmix32(0xFFFFFFFF) == 0x81F16F39
    # input masked to 32 bits like Chapel's uint(32) parameter
    assert fmix32(1 << 32 | 1) == fmix32(1)


def test_string_fold_matches_reference_shape():
    """djb2-xor fold replay: hash = ((hash << 5) + hash) ^ byte, then
    fmix32 — checked against a hand-unrolled computation for a short
    term (independent arithmetic, no shared code path)."""
    term = "ab"
    h = 0
    h = ((h * 33) ^ ord("a")) & 0xFFFFFFFF
    h = ((h * 33) ^ ord("b")) & 0xFFFFFFFF
    assert gen_hash_key32(term) == fmix32(h)
    assert gen_hash_key32(b"ab") == gen_hash_key32("ab")


def test_batch_equals_scalar():
    terms = ["merge", "sort", "dup", "", "loop_var", "x" * 300, "日本語"]
    batch = gen_hash_key32_batch(terms)
    assert batch.dtype == np.uint32
    for t, b in zip(terms, batch):
        assert int(b) == gen_hash_key32(t), t


def test_reference_bucket_range_and_determinism():
    terms = [f"t{i}" for i in range(2000)]
    buckets = [reference_bucket(t) for t in terms]
    assert all(0 <= b < 32 * 1024 for b in buckets)
    assert buckets == [reference_bucket(t) for t in terms]
    # the finalizer exists to spread the weak fold: buckets must not
    # collapse (2000 sequential terms -> nearly all distinct buckets)
    assert len(set(buckets)) > 1800
