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


# --- query-string parser --------------------------------------------------


def test_parse_query_grammar():
    from chearch_spark.plans.parser import QueryParseError, parse_query
    from chearch_spark.plans.query import (
        And, Diff, Fuzzy, Or, Prefix, Term,
    )
    import pytest

    assert parse_query("merge") == Term("merge")
    # whitespace = AND; builder sugar order (a & b -> And(b, a))
    assert parse_query("merge sort") == (Term("merge") & Term("sort"))
    assert parse_query("merge AND sort") == (Term("merge") & Term("sort"))
    # OR binds looser than adjacency
    assert parse_query("a b OR c") == ((Term("a") & Term("b")) | Term("c"))
    # parens override
    assert parse_query("a (b OR c)") == (
        Term("a") & (Term("b") | Term("c"))
    )
    # negation groups: a -b -c == a AND NOT (b OR c)
    assert parse_query("a -b -c") == Diff(
        Term("a"), Term("b") | Term("c")
    )
    assert parse_query("a NOT b") == Diff(Term("a"), Term("b"))
    # leaf markers
    assert parse_query("mer*") == Prefix("mer")
    assert parse_query("merg~") == Fuzzy("merg")
    assert parse_query("a merg~ OR mer*") == (
        (Term("a") & Fuzzy("merg")) | Prefix("mer")
    )
    # keywords are case-insensitive
    assert parse_query("a or b") == (Term("a") | Term("b"))

    for bad in ["", "   ", "-a", "a AND", "(a", "a)", "a - ", "NOT a"]:
        with pytest.raises(QueryParseError):
            parse_query(bad)
