"""Oracle semantics: helloworld golden scenario (README.md:109-124,
FIXTURES.md F3) + BM25 pinned-spec checks."""

import math

from chearch_spark import spec
from chearch_spark.oracle import OracleIndex
from chearch_spark.plans.query import Term, from_postfix


def _helloworld() -> OracleIndex:
    ix = OracleIndex()
    ix.add_pretokenized(10, [(6, "t2"), (15, "t3")])
    ix.add_pretokenized(15, [(6, "t2")])
    return ix


def test_helloworld_term():
    ix = _helloworld()
    # newest-first: doc 15 (added later) before doc 10
    assert ix.parity_search(Term("t2")) == [("t2", 6, 15), ("t2", 6, 10)]
    assert ix.parity_search(Term("t3")) == [("t3", 15, 10)]


def test_helloworld_or_no_dedup():
    ix = _helloworld()
    q = from_postfix([("PUSH", "t2"), ("PUSH", "t3"), ("OR",)])
    assert ix.parity_search(q) == [
        ("t2", 6, 15),
        ("t3", 15, 10),
        ("t2", 6, 10),
    ]


def test_helloworld_and_dual_emit():
    ix = _helloworld()
    q = from_postfix([("PUSH", "t2"), ("PUSH", "t3"), ("AND",)])
    assert ix.parity_search(q) == [("t3", 15, 10), ("t2", 6, 10)]


def test_missing_term_empty():
    ix = _helloworld()
    assert ix.parity_search(Term("nope")) == []
    assert ix.search(Term("nope")) == []
    # AND with missing term short-circuits to empty
    q = from_postfix([("PUSH", "t2"), ("PUSH", "nope"), ("AND",)])
    assert ix.parity_search(q) == []


def test_and_alternating_multi_occurrence():
    """Doc where A has 2 occurrences, B has 1: reference alternates
    a1, b1, a2 (operands.chpl:111-139 curOp bookkeeping)."""
    ix = OracleIndex()
    ix.add_pretokenized(7, [(1, "a"), (5, "a"), (3, "b")])
    q = from_postfix([("PUSH", "b"), ("PUSH", "a"), ("AND",)])
    # opA = term 'a' (popped first); newest-first within doc: pos 5 first
    assert ix.parity_search(q) == [("a", 5, 7), ("b", 3, 7), ("a", 1, 7)]


def test_bm25_single_doc_formula():
    ix = OracleIndex()
    ix.add_document(1, "foo bar foo")
    ix.add_document(2, "bar baz")
    # term foo: df=1, N=2, tf in doc1 = 2, len=3, avgdl=2.5
    res = ix.search(Term("foo"))
    assert [d for d, _ in res] == [1]
    idf = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    tf, dl, avgdl = 2.0, 3.0, 2.5
    expect = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert abs(res[0][1] - expect) < 1e-12


def test_bm25_tiebreak_doc_id_asc():
    ix = OracleIndex()
    ix.add_document(5, "x y")
    ix.add_document(3, "x y")
    res = ix.search(Term("x"))
    assert [d for d, _ in res] == [3, 5]
    assert res[0][1] == res[1][1]


def test_tokenizer_spec():
    assert spec.tokenize("Def foo_bar2(x); return X") == [
        "def", "foo_bar2", "x", "return", "x",
    ]
    assert spec.tokenize("") == []
    assert spec.tokenize("...") == []


def test_position_cap_parity_vs_bm25_tf():
    """Positions above MAX_POSITION are not recorded (8-bit parity) but
    BM25 tf counts all occurrences (FIXTURES F4 pin)."""
    toks = [(i, "w") for i in range(300)]
    ix = OracleIndex()
    ix.add_pretokenized(1, toks)
    occ = ix.parity_search(Term("w"))
    assert len(occ) == 256  # pos 0..255 recorded
    assert ix.tf["w"][0] == 300  # raw tf uncapped
