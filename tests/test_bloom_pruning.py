"""Per-segment term-Bloom pruning: unique rare terms must prune the
segment fan-out to ~1 segment, with results identical to an unpruned
scan (false negatives impossible)."""

import pandas as pd
import pytest

from chearch_spark.build import build_index
from chearch_spark.operators.bloom import bloom_contains, make_bloom
from chearch_spark.plans.query import Term
from chearch_spark.search import Index


def test_bloom_unit():
    m, b = make_bloom(["alpha", "beta", "gamma"])
    assert all(bloom_contains(b, m, t) for t in ["alpha", "beta", "gamma"])
    # FP rate is ~1%; these specific absents must miss for this fixture
    misses = sum(
        not bloom_contains(b, m, t) for t in [f"absent{i}" for i in range(50)]
    )
    assert misses >= 45


@pytest.fixture(scope="module")
def pruned_index(spark, tmp_path_factory):
    # every doc carries a unique term -> each unique term lives in
    # exactly one segment; 'common' lives everywhere
    rows = [(i, f"common uniq{i:04d} filler") for i in range(200)]
    out = str(tmp_path_factory.mktemp("bloom_ix"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    build_index(spark, df, out, num_segments=16, resume=False)
    return Index(spark, out)


def test_rare_term_prunes_fanout(pruned_index):
    ix = pruned_index
    cand = ix.candidate_segments(Term("uniq0042"))
    assert cand is not None and 1 <= len(cand) <= 2  # 1 + rare bloom FPs
    assert len(ix.candidate_segments(Term("common"))) == 16
    # AND with a rare term prunes to the rare term's segment(s)
    cand_and = ix.candidate_segments(Term("common") & Term("uniq0042"))
    assert 1 <= len(cand_and) <= 2
    # missing term: pure-AND prunes to nothing
    assert ix.candidate_segments(Term("zz_nope_zz") & Term("common")) == []


def test_pruned_results_identical(pruned_index):
    ix = pruned_index
    for q in (
        Term("uniq0042"),
        Term("common") & Term("uniq0042"),
        Term("uniq0001") | Term("uniq0199"),
    ):
        got = [(r.doc_id, round(r.score, 9)) for r in ix.search(q, k=10).collect()]
        # disable pruning and compare
        saved = ix._blooms
        ix._blooms = {}
        try:
            want = [
                (r.doc_id, round(r.score, 9))
                for r in ix.search(q, k=10).collect()
            ]
        finally:
            ix._blooms = saved
        assert got == want, q
        local = [(d, round(s, 9)) for d, s in ix.local_search(q, k=10)]
        assert local == want, q


def test_missing_term_empty_via_pruning(pruned_index):
    assert pruned_index.search(
        Term("zz_nope_zz") & Term("common"), k=5
    ).count() == 0
