"""Query AST <-> postfix parity (chasm.chpl stack semantics)."""

import pytest

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


def test_parse_query_phrase_near_grammar():
    from chearch_spark.plans.parser import QueryParseError, parse_query
    from chearch_spark.plans.query import Diff, Near, Phrase, Term
    import pytest

    # quoted phrase -> Phrase leaf
    assert parse_query('"merge sort"') == Phrase(("merge", "sort"))
    assert parse_query('"one"') == Phrase(("one",))
    assert parse_query('a "merge sort" OR c') == (
        (Term("a") & Phrase(("merge", "sort"))) | Term("c")
    )
    # negated phrase
    assert parse_query('a -"merge sort"') == Diff(
        Term("a"), Phrase(("merge", "sort"))
    )
    # NEAR infix, explicit and default windows
    assert parse_query("a NEAR/3 b") == Near("a", "b", 3)
    assert parse_query("a NEAR b") == Near("a", "b", 5)
    assert parse_query("x a NEAR/2 b") == (
        Term("x") & Near("a", "b", 2)
    )
    # NEAR is positional: at clause start/end it is an ordinary term
    assert parse_query("near miss") == (Term("near") & Term("miss"))
    assert parse_query("a near") == (Term("a") & Term("near"))
    assert parse_query("a near OR b") == (
        (Term("a") & Term("near")) | Term("b")
    )
    # intra-word hyphens stay in the token (ADVICE r5: 'covid-19'
    # must not parse as Diff); leading '-' is still negation
    assert parse_query("covid-19") == Term("covid-19")
    assert parse_query("a -b") == Diff(Term("a"), Term("b"))

    for bad in ['"', '"a b', '""', 'a NEAR/2 (b c)', '"a" NEAR/2 b']:
        with pytest.raises(QueryParseError):
            parse_query(bad)


def test_positional_helpers():
    from chearch_spark.plans.query import (
        Near, Phrase, all_terms_required, has_positional,
        positional_terms, scoring_terms, to_postfix,
    )
    import pytest

    p = Phrase(("a", "b"))
    n = Near("x", "y", 2)
    assert has_positional(p) and has_positional(Term("z") & p)
    assert not has_positional(Term("z") & Term("w"))
    assert positional_terms((Term("z") & p) | n) == {"a", "b", "x", "y"}
    assert positional_terms(Term("z")) == set()
    # conjunctions of Term/Phrase/Near require every term; Or/Diff don't
    assert all_terms_required(Term("z") & p)
    assert all_terms_required(n)
    assert not all_terms_required(Term("z") | p)
    assert p.terms() == ["a", "b"]
    assert set(scoring_terms(Term("z") & p)) == {"a", "b", "z"}
    # no opcode in the reference's 4-op wire format
    for node in (p, n):
        with pytest.raises(ValueError):
            to_postfix(node)


def test_parse_query_wildcard_grammar():
    from chearch_spark.plans.parser import QueryParseError, parse_query
    from chearch_spark.plans.query import Prefix, Term, Wildcard

    # trailing single star stays a Prefix (back-compat, cheaper probe)
    assert parse_query("mer*") == Prefix("mer")
    # any other '*'/'?' placement is a Wildcard leaf
    assert parse_query("m*ge") == Wildcard("m*ge")
    assert parse_query("*ort") == Wildcard("*ort")
    assert parse_query("s?rt") == Wildcard("s?rt")
    assert parse_query("s?rt*") == Wildcard("s?rt*")
    assert parse_query("m*e OR dup") == (Wildcard("m*e") | Term("dup"))
    # all-wildcard patterns match everything -> rejected at parse
    for bad in ("*", "***", "?", "*?"):
        with pytest.raises(QueryParseError, match="bare wildcard"):
            parse_query(bad)


def test_wildcard_normalize_validation():
    from chearch_spark.search import _normalize
    from chearch_spark.plans.query import Wildcard

    assert _normalize(Wildcard("M*GE")) == Wildcard("m*ge")
    with pytest.raises(ValueError, match="no '\\*' or '\\?'"):
        _normalize(Wildcard("plain"))
    with pytest.raises(ValueError, match="no literal"):
        _normalize(Wildcard("*?*"))
    with pytest.raises(ValueError, match="not token"):
        _normalize(Wildcard("a.b*"))


def test_wildcard_regex_helpers():
    import re

    from chearch_spark.search import (
        _wildcard_literal_prefix,
        _wildcard_regex,
    )

    rx = re.compile(_wildcard_regex("m*g?"))
    assert rx.fullmatch("merge")
    assert rx.fullmatch("mga")
    assert not rx.fullmatch("mg")       # '?' needs exactly one char
    assert not rx.fullmatch("xmerge")   # anchored
    assert _wildcard_literal_prefix("mer*") == "mer"
    assert _wildcard_literal_prefix("*ort") == ""
    assert _wildcard_literal_prefix("a?b") == "a"


def test_boost_grammar_and_algebra():
    from chearch_spark.plans.parser import QueryParseError, parse_query
    from chearch_spark.plans.query import (
        Diff,
        Or,
        Term,
        scoring_weights,
        to_postfix,
    )

    # grammar: term^w parses to a boosted Term; default boost is 1.0
    assert parse_query("merge^2.5") == Term("merge", 2.5)
    assert parse_query("merge^2.5 OR dup") == (
        Term("merge", 2.5) | Term("dup")
    )
    assert Term("x") == Term("x", 1.0)
    for bad in [
        "merge^", "^2", "merge^x", "merge^0", "merge^-1",
        "merg~^2", "m*ge^2", "mer*^2", "merge^inf", "merge^nan",
        "a^2^3",
    ]:
        with pytest.raises(QueryParseError):
            parse_query(bad)
    with pytest.raises(ValueError, match="finite"):
        Term("a", 0)

    # weights walk: MAX across duplicate leaves incl. the implicit
    # 1.0 of an unboosted leaf; Diff's negative side never scores
    assert scoring_weights(Or(Term("a", 2.0), Term("b"))) == {"a": 2.0}
    assert scoring_weights(Or(Term("a", 0.5), Term("a"))) == {}
    assert scoring_weights(Diff(Term("a"), Term("b", 3.0))) == {}

    # a boosted term has no CHASM opcode (wire carries bare hashes)
    with pytest.raises(ValueError, match="no opcode"):
        to_postfix(Term("a", 2.0))

    # normalization distributes a multi-token term's boost
    from chearch_spark.search import _normalize

    n = _normalize(Term("covid-19", 2.0))
    assert scoring_weights(n) == {"covid": 2.0, "19": 2.0}


def test_phrase_prefix_grammar():
    from chearch_spark.plans.parser import QueryParseError, parse_query
    from chearch_spark.plans.query import (
        Phrase,
        PhrasePrefix,
        Prefix,
        to_postfix,
    )
    from chearch_spark.search import _normalize

    assert parse_query('"merge so*"') == PhrasePrefix(("merge", "so"))
    assert parse_query('"a b so*"') == PhrasePrefix(("a", "b", "so"))
    assert parse_query('"so*"') == Prefix("so")  # one word = bare prefix
    assert parse_query('"merge sort"') == Phrase(("merge", "sort"))
    for bad in ['"me*ge so"', '"merge so?"', '"*"', '"m* so*"']:
        with pytest.raises(QueryParseError):
            parse_query(bad)
    # normalization: case folding, multi-token leading words, one-word
    # degradation, prefix-token validation
    assert _normalize(PhrasePrefix(("MERGE", "SO"))) == PhrasePrefix(
        ("merge", "so")
    )
    assert _normalize(PhrasePrefix(("covid-19", "so"))) == PhrasePrefix(
        ("covid", "19", "so")
    )
    assert _normalize(PhrasePrefix(("so",))) == Prefix("so")
    with pytest.raises(ValueError):
        _normalize(PhrasePrefix(("merge", "s o")))
    with pytest.raises(ValueError, match="no opcode"):
        to_postfix(PhrasePrefix(("a", "b")))


def test_synonym_algebra():
    from chearch_spark.plans.query import (
        Or,
        Synonym,
        Term,
        scoring_terms,
        synonym_leaves,
        to_postfix,
    )
    from chearch_spark.search import _normalize

    s = Synonym(("b", "a"))
    # normalize: dedupe + sort (deterministic blend key), case fold,
    # one-member degradation, multi-token member rejection
    assert _normalize(Synonym(("B", "a", "b"))) == Synonym(("a", "b"))
    assert _normalize(Synonym(("a",))) == Term("a")
    with pytest.raises(ValueError, match="one token"):
        _normalize(Synonym(("a b",)))
    with pytest.raises(ValueError, match="at least one"):
        _normalize(Synonym(()))
    # the scoring key is the pseudo-term, not the members
    assert scoring_terms(s) == [s.key()]
    assert s.key().startswith("\x00syn:")
    assert synonym_leaves(Or(s, Term("x"))) == [s]
    with pytest.raises(ValueError, match="no opcode"):
        to_postfix(s)


def test_regexp_grammar_and_helpers():
    from chearch_spark.plans.parser import QueryParseError, parse_query
    from chearch_spark.plans.query import (
        Diff,
        Regexp,
        Term,
        scoring_terms,
        to_postfix,
    )
    from chearch_spark.search import (
        _normalize,
        _regexp_literal_prefix,
        _validate_regexp,
    )

    assert parse_query("/s(or|ub)t/") == Regexp("s(or|ub)t")
    assert parse_query("/s.rt/ OR dup") == (Regexp("s.rt") | Term("dup"))
    assert parse_query("a -/s.rt/") == Diff(Term("a"), Regexp("s.rt"))
    # a NEGATED parenthesized pattern must stay one token (the lexer
    # consumes leading '-'s into the regex alternative)
    assert parse_query("a -/s(or|ub)t/") == Diff(
        Term("a"), Regexp("s(or|ub)t")
    )
    with pytest.raises(QueryParseError):
        parse_query("/re/^2")  # boost applies to plain terms only
    # normalize: lowercase + cross-engine subset validation; uppercase
    # escape classes would be INVERTED by the case fold (\D -> \d) and
    # Java-divergent syntax (bare '{', possessive quantifiers) would
    # make the driver and distributed probes disagree — all rejected
    assert _normalize(Regexp("S.RT")) == Regexp("s.rt")
    for bad in [r"a(?=b)", r"(a)\1", "a(", "", r"a\D+", r"\Wx",
                "a{b", "a*+", "a++"]:
        with pytest.raises(ValueError):
            _normalize(Regexp(bad))
    _validate_regexp("a(?:b|c)+[0-9]{1,3}")  # the allowed subset
    _validate_regexp(r"a\{b")                # escaped brace is fine
    # guaranteed-literal-prefix rules (range pruning must never
    # over-claim)
    assert _regexp_literal_prefix("sort") == "sort"
    assert _regexp_literal_prefix("sor*t") == "so"
    assert _regexp_literal_prefix("s.rt") == "s"
    assert _regexp_literal_prefix("ab+") == "ab"
    assert _regexp_literal_prefix("ab?") == "a"
    assert _regexp_literal_prefix("a|b") == ""
    assert _regexp_literal_prefix(".*x") == ""
    assert scoring_terms(Regexp("a.b")) == []
    with pytest.raises(ValueError, match="no opcode"):
        to_postfix(Regexp("a"))


def test_regexp_prefix_grouped_alternation():
    """Range-pruning prefix: a '|' INSIDE a group keeps the leading
    literal; a top-level '|' (even after other metachars) kills it."""
    from chearch_spark.search import _regexp_literal_prefix as p

    assert p("s(or|ub).*") == "s"
    assert p("s(or|ub)t") == "s"
    assert p("s.a|b") == ""      # top-level alternation after the break
    assert p(r"a\|b") == "a"     # escaped pipe is a literal
    assert p("[ab]x") == ""
