"""Query-string parser: user-typed strings -> the Node algebra.

Grammar (Lucene-flavored, covers every leaf the engine has):

    query    :=  or_expr
    or_expr  :=  and_expr ( OR and_expr )*
    and_expr :=  clause+                      # whitespace = AND
    clause   :=  '-' prox | NOT prox | prox   # negation -> Diff
    prox     :=  atom ( NEAR[/k] atom )?      # proximity -> Near
    atom     :=  '(' query ')' | phrase | word
    phrase   :=  '"' token+ '"' -> Phrase(tokens)
              |  '"' token+ tok'*' '"' -> PhrasePrefix  # trailing star
    word     :=  token '^' num -> Term(token, boost)  # BM25 reweight
              |  token '*'  -> Prefix(token)     # trailing-only star
              |  token '~'  -> Fuzzy(token)
              |  glob       -> Wildcard(glob)    # '*'/'?' elsewhere
              |  token      -> Term(token)

``AND`` / ``OR`` / ``NOT`` / ``NEAR`` keywords are case-insensitive;
adjacency binds tighter than OR (standard search-engine precedence:
``a b OR c`` parses as ``(a AND b) OR c``).  ``a NEAR/3 b`` matches
docs where the terms occur within 3 stored positions of each other
(bare ``NEAR`` = window 5, :data:`DEFAULT_NEAR_WINDOW`); both
operands must be plain terms, and ``NEAR`` is an operator only in
infix position — at clause start it is an ordinary search term.
``"exact phrase"`` builds a :class:`Phrase` leaf routed to the
positions kernel (`search.py` ``match_phrase``).  Negative clauses
subtract from the positive conjunction of their group (``a -b -c`` =
``a AND NOT (b OR c)``, the engine's Diff); a group with ONLY
negative clauses raises — "everything except b" has no doc-set
anchor, matching the engine's lack of a full-corpus NOT (SURVEY
§2.5).  ``-`` is negation only at clause start: intra-word hyphens
(``covid-19``) stay part of the token, which downstream
normalization tokenizes into the adjacent-token conjunction.

The parser produces exactly the same Nodes the programmatic API
builds, so every downstream path (normalization, Prefix/Fuzzy
expansion, WAND, local path, CHASM wire checks) is shared.  The
reference has no string queries at all — its clients assemble CHASM
bytecode (`chasm.chpl:91-145`); this is the human-facing front end a
user switching engines expects.
"""

from __future__ import annotations

import re

from chearch_spark.plans.query import (
    Diff,
    Fuzzy,
    Near,
    Node,
    Or,
    Phrase,
    PhrasePrefix,
    Prefix,
    Regexp,
    Term,
    Wildcard,
)

# token / operator lexer: quoted phrases, parens, and bare word tokens
# (the tokenizer's alphabet plus '.', intra-word '-', etc. is
# validated later by _normalize).  Leading '-'s are split off word
# tokens in a post-pass (negation is positional: only at clause
# start), so 'covid-19' stays one token while '-covid' lexes as
# ('-', 'covid').
# the /regex/ alternative must come before '('/')' so a pattern's own
# grouping parens stay inside one token; '/' cannot appear INSIDE a
# pattern (the token alphabet is [a-z0-9_], so a slash could never
# match a term anyway).  Leading '-'s are consumed INTO the regex
# alternative (then split off by the post-pass below) — otherwise
# '-/s(or|ub)t/' would fall to the word alternative, which stops at
# '(' and silently shreds the pattern into unrelated terms
_LEX = re.compile(r'"[^"]*"|-*/[^\s/]+/|\(|\)|[^\s()"]+')

_NEAR_RE = re.compile(r"NEAR(?:/(\d+))?", re.IGNORECASE)

DEFAULT_NEAR_WINDOW = 5


def _lex(text: str) -> list[str]:
    if text.count('"') % 2:
        raise QueryParseError("unbalanced '\"' (unterminated phrase)")
    toks: list[str] = []
    for t in _LEX.findall(text):
        if t.startswith('"'):
            toks.append(t)
            continue
        while t.startswith("-") and len(t) > 1:
            toks.append("-")
            t = t[1:]
        toks.append(t)
    return toks


class QueryParseError(ValueError):
    pass


def _and_fold(parts: list[Node]) -> Node:
    out = parts[0]
    for p in parts[1:]:
        out = out & p
    return out


def _or_fold(parts: list[Node]) -> Node:
    out = parts[0]
    for p in parts[1:]:
        out = out | p
    return out


class _Parser:
    def __init__(self, text: str):
        self.toks = _lex(text)
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Node:
        node = self.or_expr()
        if self.peek() is not None:
            raise QueryParseError(
                f"unexpected {self.peek()!r} at token {self.i}"
            )
        return node

    def or_expr(self) -> Node:
        parts = [self.and_expr()]
        while self.peek() is not None and self.peek().upper() == "OR":
            self.take()
            parts.append(self.and_expr())
        return _or_fold(parts)

    def and_expr(self) -> Node:
        pos: list[Node] = []
        neg: list[Node] = []
        while True:
            t = self.peek()
            if t is None or t == ")" or t.upper() == "OR":
                break
            if t.upper() == "AND":
                self.take()
                nxt = self.peek()
                if nxt is None or nxt == ")" or nxt.upper() == "OR":
                    raise QueryParseError("dangling AND")
                continue
            if t == "-" or t.upper() == "NOT":
                self.take()
                nxt = self.peek()
                if nxt is None or nxt in (")", "-") or nxt.upper() in (
                    "AND",
                    "OR",
                    "NOT",
                ):
                    raise QueryParseError("dangling negation")
                neg.append(self.prox())
                continue
            pos.append(self.prox())
        if not pos:
            if neg:
                raise QueryParseError(
                    "a group of only negative clauses has no positive "
                    "anchor (the engine has no full-corpus NOT)"
                )
            raise QueryParseError("empty clause")
        node = _and_fold(pos)
        if neg:
            node = Diff(node, _or_fold(neg))
        return node

    def prox(self) -> Node:
        """atom, optionally followed by an infix ``NEAR[/k] atom``.
        NEAR is an operator only BETWEEN two operands — at clause
        start or clause end the token is an ordinary term, so a user
        can still search for the word 'near'."""
        node = self.atom()
        t = self.peek()
        if t is None or t.startswith('"') or t in ("(", ")", "-"):
            return node
        m = _NEAR_RE.fullmatch(t)
        if m is None:
            return node
        nxt = (
            self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
        )
        if nxt is None or nxt in (")", "-") or (
            not nxt.startswith('"')
            and nxt != "("
            and nxt.upper() in ("AND", "OR", "NOT")
        ):
            return node  # trailing 'near' = a term, not an operator
        self.take()
        right = self.atom()
        if not isinstance(node, Term) or not isinstance(right, Term):
            raise QueryParseError(
                "NEAR operands must be plain terms (no phrases, "
                "prefixes, fuzzies, or groups)"
            )
        if node.boost != 1.0 or right.boost != 1.0:
            # refusing beats silently discarding the user's weight
            raise QueryParseError(
                "NEAR operands cannot carry boosts (positional leaves "
                "score their member terms unweighted)"
            )
        window = int(m.group(1)) if m.group(1) else DEFAULT_NEAR_WINDOW
        out = Near(node.term, right.term, window)
        # a SECOND infix NEAR would otherwise lex as the literal term
        # 'near' (or 'NEAR/3' -> the tokens 'near' AND '3'), silently
        # turning a chained-proximity query into a nonsense AND —
        # refuse loudly instead (chaining is genuinely unsupported:
        # Near is a binary leaf)
        t2 = self.peek()
        if t2 is not None and _NEAR_RE.fullmatch(t2):
            nxt2 = (
                self.toks[self.i + 1]
                if self.i + 1 < len(self.toks)
                else None
            )
            if nxt2 is not None and nxt2 not in (")", "-") and not (
                not nxt2.startswith('"')
                and nxt2 != "("
                and nxt2.upper() in ("AND", "OR", "NOT")
            ):
                raise QueryParseError(
                    "chained NEAR is not supported (NEAR is a binary "
                    "operator); split into explicit clauses, e.g. "
                    "'(a NEAR/3 b) AND (b NEAR/3 c)'"
                )
        return out

    def atom(self) -> Node:
        t = self.take()
        if t.startswith('"'):
            words = tuple(t[1:-1].split())
            if not words:
                raise QueryParseError("empty phrase")
            if any("*" in w or "?" in w for w in words[:-1]) or (
                "?" in words[-1] or "*" in words[-1][:-1]
            ):
                raise QueryParseError(
                    "wildcards inside a phrase support only a "
                    "trailing prefix star (\"merge so*\")"
                )
            if words[-1].endswith("*"):
                if len(words[-1]) == 1:
                    raise QueryParseError(
                        'bare "*" phrase suffix has no prefix'
                    )
                stem = words[:-1] + (words[-1][:-1],)
                # a one-word phrase prefix is just a prefix query
                return (
                    PhrasePrefix(stem) if len(stem) > 1 else Prefix(stem[0])
                )
            return Phrase(words)
        if t == "(":
            node = self.or_expr()
            if self.peek() != ")":
                raise QueryParseError("unbalanced '('")
            self.take()
            return node
        if t == ")":
            raise QueryParseError("unbalanced ')'")
        if t.startswith("/") and t.endswith("/") and len(t) > 2:
            # Lucene /regex/ syntax — whole-term anchored, expanded
            # against the dictionary (validation happens in the
            # engine's _normalize, where the cross-engine subset is
            # enforced)
            return Regexp(t[1:-1])
        if "^" in t:
            # Lucene-style query-time boost: term^2.5 (plain terms
            # only — a boost reweights BM25 scoring, and the unranked
            # leaves (prefix/wildcard/fuzzy/phrase) have no score to
            # reweight per-expansion)
            base, _, bexpr = t.rpartition("^")
            if not base or "^" in base:
                raise QueryParseError(f"malformed boost in {t!r}")
            if any(c in base for c in "*?~/"):
                raise QueryParseError(
                    f"boost applies to plain terms only, got {t!r}"
                )
            try:
                boost = float(bexpr)
            except ValueError:
                raise QueryParseError(
                    f"boost in {t!r} is not a number"
                ) from None
            if not (boost > 0.0 and boost != float("inf")):
                raise QueryParseError(
                    f"boost must be a finite number > 0, got {t!r}"
                )
            return Term(base, boost)
        if (
            t.endswith("*")
            and len(t) > 1
            and "*" not in t[:-1]
            and "?" not in t
        ):
            return Prefix(t[:-1])
        if "*" in t or "?" in t:
            if not t.replace("*", "").replace("?", ""):
                raise QueryParseError(
                    f"bare wildcard {t!r} would match the entire "
                    "vocabulary"
                )
            return Wildcard(t)
        if t.endswith("~") and len(t) > 1:
            return Fuzzy(t[:-1])
        return Term(t)


def parse_query(text: str) -> Node:
    """Parse a user query string into the Node algebra (module
    docstring has the grammar).  Raises :class:`QueryParseError` on
    malformed input; per-token validation (lowercasing, alphabet)
    happens later in the engine's shared ``_normalize``."""
    if not text or not text.strip():
        raise QueryParseError("empty query")
    return _Parser(text).parse()
