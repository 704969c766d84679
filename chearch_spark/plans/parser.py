"""Query-string parser: user-typed strings -> the Node algebra.

Grammar (Lucene-flavored, covers every leaf the engine has):

    query    :=  or_expr
    or_expr  :=  and_expr ( OR and_expr )*
    and_expr :=  clause+                      # whitespace = AND
    clause   :=  '-' atom | NOT atom | atom   # negation -> Diff
    atom     :=  '(' query ')' | word
    word     :=  token '*'  -> Prefix(token)
              |  token '~'  -> Fuzzy(token)
              |  token      -> Term(token)

``AND`` / ``OR`` / ``NOT`` keywords are case-insensitive; adjacency
binds tighter than OR (standard search-engine precedence: ``a b OR c``
parses as ``(a AND b) OR c``).  Negative clauses subtract from the
positive conjunction of their group (``a -b -c`` = ``a AND NOT (b OR
c)``, the engine's Diff); a group with ONLY negative clauses raises —
"everything except b" has no doc-set anchor, matching the engine's
lack of a full-corpus NOT (SURVEY §2.5).

The parser produces exactly the same Nodes the programmatic API
builds, so every downstream path (normalization, Prefix/Fuzzy
expansion, WAND, local path, CHASM wire checks) is shared.  The
reference has no string queries at all — its clients assemble CHASM
bytecode (`chasm.chpl:91-145`); this is the human-facing front end a
user switching engines expects.
"""

from __future__ import annotations

import re

from chearch_spark.plans.query import Diff, Fuzzy, Node, Or, Prefix, Term

# token / operator lexer: parens, the postfix markers * and ~, '-'
# negation, and bare tokens (the tokenizer's alphabet plus '.' etc. is
# validated later by _normalize, so the lexer accepts any word chars)
_LEX = re.compile(r"\(|\)|-|[^\s()\-]+")


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
        self.toks = _LEX.findall(text)
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
                neg.append(self.atom())
                continue
            pos.append(self.atom())
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

    def atom(self) -> Node:
        t = self.take()
        if t == "(":
            node = self.or_expr()
            if self.peek() != ")":
                raise QueryParseError("unbalanced '('")
            self.take()
            return node
        if t == ")":
            raise QueryParseError("unbalanced ')'")
        if t.endswith("*") and len(t) > 1:
            return Prefix(t[:-1])
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
