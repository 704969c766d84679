"""Query AST <-> postfix parity (chasm.chpl stack semantics)."""

from chearch_spark.plans.query import (
    And,
    Or,
    Term,
    conjunctive_terms,
    disjunctive_terms,
    from_postfix,
    to_postfix,
)


def test_postfix_roundtrip_binary():
    prog = [("PUSH", "a"), ("PUSH", "b"), ("AND",)]
    node = from_postfix(prog)
    # AND pops top first: a = second-pushed operand (chasm.chpl:180)
    assert node == And(Term("b"), Term("a"))
    assert to_postfix(node) == prog


def test_postfix_nested():
    prog = [("PUSH", "a"), ("PUSH", "b"), ("AND",), ("PUSH", "c"), ("OR",)]
    node = from_postfix(prog)
    assert node == Or(Term("c"), And(Term("b"), Term("a")))
    assert to_postfix(node) == prog


def test_builder_sugar_matches_postfix():
    assert Term("a") & Term("b") == from_postfix(
        [("PUSH", "a"), ("PUSH", "b"), ("AND",)]
    )
    assert (Term("a") & Term("b")) | Term("c") == from_postfix(
        [("PUSH", "a"), ("PUSH", "b"), ("AND",), ("PUSH", "c"), ("OR",)]
    )


def test_terms_distinct_push_order():
    node = (Term("x") & Term("y")) | Term("x")
    assert node.terms() == ["x", "y"]


def test_nary_folding():
    assert conjunctive_terms(Term("a") & Term("b") & Term("c")) == [
        "a", "b", "c",
    ]
    assert conjunctive_terms(Term("a") | Term("b")) is None
    assert disjunctive_terms(Term("a") | Term("b") | Term("a")) == ["a", "b"]
    assert disjunctive_terms(Term("a") & Term("b")) is None


def test_halt_stops():
    node = from_postfix([("PUSH", "a"), ("HALT",)])
    assert node == Term("a")
