"""Query AST + postfix (CHASM-parity) compiler.

The reference compiles queries to a 4-opcode stack bytecode
(``HALT/PUSH/AND/OR``, `chasm.chpl:8-13`) interpreted into an operand
tree (`chasm.chpl:150-186`).  We keep a declarative AST with the same
expressive power and a postfix round-trip so reference query programs
(`PUSH a, PUSH b, AND`) map 1:1 onto ASTs.

Stack parity detail (`chasm.chpl:180-181`): a binary opcode pops the
TOP of the stack first, so ``PUSH 2, PUSH 3, AND`` builds
``And(a=<term 3>, b=<term 2>)`` where *a* (the second-pushed term) is
the reference's ``opA`` — its occurrence is emitted first on a doc
match (`operands.chpl:120-131`, README.md:122-124).
"""

from __future__ import annotations

from dataclasses import dataclass

# Opcode values kept numerically identical to `chasm.chpl:8-13` for
# wire-parity tests.
OP_HALT = 0
OP_PUSH = 1
OP_AND = 2
OP_OR = 3


class Node:
    """Base query node; supports `&` / `|` / `-` builder sugar."""

    def __and__(self, other: "Node") -> "And":
        return And(other, self)  # postfix `a b AND` pops b first -> a=other

    def __or__(self, other: "Node") -> "Or":
        return Or(other, self)

    def __sub__(self, other: "Node") -> "Diff":
        return Diff(self, other)

    def terms(self) -> list[str]:
        """Distinct terms, first-occurrence order."""
        out: list[str] = []
        seen = set()
        for t in self._terms():
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out

    def _terms(self):  # pragma: no cover - overridden
        raise NotImplementedError


@dataclass(frozen=True)
class Term(Node):
    """Exact-term leaf, optionally boosted (the Lucene ``term^2.5``
    query-time boost): ``boost`` multiplies this term's BM25
    contribution wherever it scores — matching is unchanged (a boost
    never adds or removes docs), and boost has no wire opcode (the
    reference's 4-op CHASM format carries bare term hashes only), so
    :func:`to_postfix` raises for ``boost != 1``."""

    term: str
    boost: float = 1.0

    def __post_init__(self):
        b = float(self.boost)
        # rejects <= 0, NaN, and inf in one pair of comparisons
        if not (b > 0.0 and b != float("inf")):
            raise ValueError(
                f"term boost must be a finite number > 0, got "
                f"{self.boost!r}"
            )
        object.__setattr__(self, "boost", b)

    def _terms(self):
        yield self.term


@dataclass(frozen=True)
class And(Node):
    a: Node  # reference opA = popped first = SECOND-pushed operand
    b: Node

    def _terms(self):
        yield from self.b._terms()
        yield from self.a._terms()


@dataclass(frozen=True)
class Or(Node):
    a: Node
    b: Node

    def _terms(self):
        yield from self.b._terms()
        yield from self.a._terms()


@dataclass(frozen=True)
class Diff(Node):
    """``a`` AND NOT ``b`` — an extension beyond the reference's
    AND/OR algebra (it has no NOT, SURVEY §2.5), needed by dedup
    pipelines ("matches A but not the boilerplate cluster").  Doc set =
    docset(a) − docset(b); BM25 scores sum over **a's terms only**
    (``scoring_terms``) — b only excludes."""

    a: Node
    b: Node

    def _terms(self):
        yield from self.a._terms()
        yield from self.b._terms()


@dataclass(frozen=True)
class Phrase(Node):
    """Exact-consecutive-phrase leaf (e.g. ``Phrase(("merge",
    "sort"))``): matches docs where the words occur at consecutive
    stored positions (the reference's 8-bit ``textLocation`` cap,
    `documentid.chpl:22` — positions > 255 are unrecorded, so phrases
    starting past 255 are unmatchable; the same data-model cap
    :meth:`Index.match_phrase` pins).  Composes with the whole algebra
    (docset = phrase-start docs); BM25 scoring sums the member terms'
    contributions (an AND whose doc set is position-filtered).
    Extension — the reference stores no positions in its query
    algebra."""

    words: tuple[str, ...]

    def __post_init__(self):
        object.__setattr__(self, "words", tuple(self.words))

    def _terms(self):
        yield from self.words


@dataclass(frozen=True)
class PhrasePrefix(Node):
    """Phrase-prefix leaf (the Elasticsearch ``match_phrase_prefix``
    search-as-you-type surface, parser form ``"merge so*"``): the
    LAST element of ``words`` is a term PREFIX; the leaf expands
    against the index dictionary into an OR of :class:`Phrase` leaves
    (one per prefix completion), each matched at consecutive stored
    positions.  Expansion follows the Prefix discipline — beyond
    ``MAX_PREFIX_EXPANSION`` it RAISES rather than silently keeping
    the first 50 completions like Lucene's max_expansions (a
    documented divergence: silent truncation silently changes
    results).  Extension — the reference has exact term ids only."""

    words: tuple[str, ...]

    def __post_init__(self):
        object.__setattr__(self, "words", tuple(self.words))

    def _terms(self):
        # leading words are exact terms; the trailing prefix resolves
        # during expansion like Prefix/Fuzzy/Wildcard
        yield from self.words[:-1]


@dataclass(frozen=True)
class Near(Node):
    """Unordered proximity leaf: docs where ``a`` and ``b`` occur
    within ``window`` stored positions of each other (the NEAR
    operator; same ≤255 position cap as :class:`Phrase`).  Scoring
    sums both terms' BM25 contributions."""

    a: str
    b: str
    window: int = 5

    def _terms(self):
        yield self.a
        yield self.b


@dataclass(frozen=True)
class Synonym(Node):
    """Blended-statistics synonym leaf (the Lucene ``SynonymQuery`` /
    BlendedTermQuery surface): member terms that name the SAME concept
    — the doc set is their union, but scoring treats the whole group
    as ONE pseudo-term: per-doc tf = SUM of member tfs, df = MAX of
    member dfs.  This is semantically different from the OR a query
    expander would build: an OR sums per-member BM25 contributions, so
    a doc mentioning two spelling variants of one concept outranks a
    doc mentioning the concept twice via one variant; the blended form
    scores both identically.  Composes with the whole algebra; no
    CHASM opcode (the reference wire carries bare term hashes).
    Members are normalized/deduped/sorted by ``_normalize`` so the
    blend key is deterministic; a one-member group degrades to Term."""

    words: tuple[str, ...]

    def __post_init__(self):
        object.__setattr__(self, "words", tuple(self.words))

    def key(self) -> str:
        """Synthetic postings/idf key for the blended pseudo-term —
        '\\x00' is outside the token alphabet, so no real term can
        collide with it."""
        return "\x00syn:" + "|".join(self.words)

    def _terms(self):
        yield from self.words


def synonym_leaves(node: Node) -> list["Synonym"]:
    """Distinct Synonym leaves of the tree in a DETERMINISTIC walk
    order (b-side before a-side, the postfix-parity convention) — the
    scoring kernels pre-merge one blended posting list per leaf, and
    per-leaf work is order-independent."""
    out: list[Synonym] = []

    def walk(n: Node) -> None:
        if isinstance(n, Synonym):
            if n not in out:
                out.append(n)
        elif isinstance(n, (And, Or, Diff)):
            walk(n.b)
            walk(n.a)
        else:
            for c in _children(n):
                walk(c)

    walk(node)
    return out


def _children(n: Node) -> tuple[Node, ...]:
    """Direct sub-nodes of a scoring combinator (empty for leaves) —
    the shared recursion step for walkers that must see through
    MinShould/DisMax/ConstantScore/Boosting."""
    if isinstance(n, (MinShould, DisMax)):
        return n.clauses
    if isinstance(n, ConstantScore):
        return (n.query,)
    if isinstance(n, Boosting):
        return (n.positive, n.negative)
    if isinstance(n, Filter):
        return (n.query,)
    return ()


@dataclass(frozen=True)
class MinShould(Node):
    """Lucene ``BooleanQuery`` minimum_should_match: matches docs
    satisfying at least ``m`` of the ``clauses``; the score is the sum
    of the MATCHED clauses' BM25 scores (a clause the doc does not
    match contributes exactly 0, Lucene's should-clause semantics).
    An extension beyond the reference's binary AND/OR algebra
    (`chasm.chpl:8-13` has no n-ary or counting opcode, SURVEY §2.5);
    ``m == 1`` degenerates to OR, ``m == len(clauses)`` to AND."""

    clauses: tuple[Node, ...]
    m: int

    def __post_init__(self):
        object.__setattr__(self, "clauses", tuple(self.clauses))
        if len(self.clauses) < 2:
            raise ValueError("MinShould needs at least 2 clauses")
        if not (1 <= int(self.m) <= len(self.clauses)):
            raise ValueError(
                f"m must be in [1, {len(self.clauses)}], got {self.m!r}"
            )
        object.__setattr__(self, "m", int(self.m))

    def _terms(self):
        for c in self.clauses:
            yield from c._terms()


@dataclass(frozen=True)
class DisMax(Node):
    """Lucene ``DisjunctionMaxQuery``: matches the UNION of the
    clauses' doc sets; score = max(clause scores) + ``tie`` * (sum of
    the other matched clauses' scores).  ``tie = 0`` is pure max
    (best-field), ``tie = 1`` degenerates to the plain should-sum."""

    clauses: tuple[Node, ...]
    tie: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "clauses", tuple(self.clauses))
        if len(self.clauses) < 2:
            raise ValueError("DisMax needs at least 2 clauses")
        t = float(self.tie)
        if not (0.0 <= t <= 1.0):
            raise ValueError(f"tie_breaker must be in [0, 1], got {self.tie!r}")
        object.__setattr__(self, "tie", t)

    def _terms(self):
        for c in self.clauses:
            yield from c._terms()


@dataclass(frozen=True)
class ConstantScore(Node):
    """Lucene ``ConstantScoreQuery`` / ES ``constant_score``: matches
    ``query``'s doc set but every hit scores exactly ``boost`` —
    the inner tree's BM25 statistics (and any boosts inside it) are
    discarded.  Ranking within a constant-score result set is the
    pinned tie-break (doc_id asc)."""

    query: Node
    boost: float = 1.0

    def __post_init__(self):
        b = float(self.boost)
        if not (b > 0.0 and b != float("inf")):
            raise ValueError(
                f"constant score boost must be finite and > 0, got "
                f"{self.boost!r}"
            )
        object.__setattr__(self, "boost", b)

    def _terms(self):
        yield from self.query._terms()


@dataclass(frozen=True)
class Boosting(Node):
    """ES ``boosting`` query: matches exactly ``positive``'s doc set;
    docs that ALSO match ``negative`` keep their positive score
    multiplied by ``negative_boost`` (demoted, never excluded — the
    soft version of Diff)."""

    positive: Node
    negative: Node
    negative_boost: float = 0.5

    def __post_init__(self):
        nb = float(self.negative_boost)
        if not (0.0 < nb <= 1.0):
            raise ValueError(
                f"negative_boost must be in (0, 1], got "
                f"{self.negative_boost!r}"
            )
        object.__setattr__(self, "negative_boost", nb)

    def _terms(self):
        # negative terms are real query terms: the kernel must decode
        # their postings to test demotion membership (the Diff pattern)
        yield from self.positive._terms()
        yield from self.negative._terms()


@dataclass(frozen=True)
class Filter(Node):
    """Lucene/ES bool-query FILTER clause: restricts the doc set to
    ``query``'s matches but contributes exactly 0 to the score (its
    terms are excluded from scoring entirely — cached-filter
    semantics, not a 0-boost).  As a root query it matches with all
    scores 0.0, ranking by the doc_id tie-break (the ES filter-only
    bool behavior)."""

    query: Node

    def _terms(self):
        # terms still drive the scan + segment pruning — only
        # SCORING skips them
        yield from self.query._terms()


def bool_query(
    must=(),
    should=(),
    filter_=(),
    must_not=(),
    minimum_should_match: int = 0,
) -> Node:
    """The Elasticsearch ``bool`` query, composed onto the algebra:

    * ``must`` — AND-required, scoring;
    * ``filter`` — AND-required, NON-scoring (``Filter`` wrap);
    * ``should`` — scoring; REQUIRED only when there is no must/filter
      (Lucene's implicit minimum_should_match=1) or when
      ``minimum_should_match`` > 0 (a MinShould count);
    * ``must_not`` — excluded (Diff).

    Scoring-only shoulds (must/filter present, msm=0) use the
    identity ``Or(core, And(core, S))`` — doc set is exactly core's,
    while the flat scorer's sum-over-present-terms picks up the
    should terms, which is Lucene's "optional clauses only add score".
    """
    must, should = list(must), list(should)
    filter_, must_not = list(filter_), list(must_not)
    if not (must or should or filter_):
        raise ValueError(
            "bool_query needs at least one positive clause (a pure "
            "must_not has no bounded universe to subtract from)"
        )
    if minimum_should_match and minimum_should_match > len(should):
        raise ValueError(
            f"minimum_should_match={minimum_should_match} exceeds the "
            f"{len(should)} should clauses"
        )

    def fold_and(cs):
        out = cs[0]
        for c in cs[1:]:
            out = And(c, out)
        return out

    def fold_or(cs):
        out = cs[0]
        for c in cs[1:]:
            out = Or(out, c)
        return out

    core = None
    if must:
        core = fold_and(must)
    if filter_:
        f = Filter(fold_and(filter_))
        core = f if core is None else And(core, f)
    if should:
        m = minimum_should_match
        if core is None:
            m = max(1, m)  # pure-should bool requires >= 1 match
        if m == 0:
            s = fold_or(should)
            core = Or(core, And(core, s))
        else:
            s = (
                should[0]
                if len(should) == 1
                else MinShould(tuple(should), m)
            )
            core = s if core is None else And(core, s)
    if must_not:
        core = Diff(core, fold_or(must_not))
    return core


def has_structured_scoring(node: Node) -> bool:
    """True when the tree contains a scoring COMBINATOR (MinShould /
    DisMax / ConstantScore / Boosting) — the flat sum-over-
    scoring-terms path is wrong for these (a non-matching clause must
    contribute 0 / max replaces sum / the score is a constant), so
    the kernels route to the structural scorer."""
    if isinstance(node, (MinShould, DisMax, ConstantScore, Boosting)):
        return True
    if isinstance(node, (And, Or, Diff)):
        return has_structured_scoring(node.a) or has_structured_scoring(
            node.b
        )
    return False


@dataclass(frozen=True)
class Prefix(Node):
    """Term-prefix leaf (e.g. ``Prefix("merg")``), expanded against the
    index dictionary into an OR of matching terms at query time.
    Expansions beyond ``MAX_PREFIX_EXPANSION`` raise (Lucene's
    TooManyClauses discipline) — silent truncation would silently
    change results.  Extension — the reference has exact term ids
    only."""

    prefix: str

    def _terms(self):
        yield from ()  # resolved during expansion, not term lookup


MAX_PREFIX_EXPANSION = 4096


@dataclass(frozen=True)
class Wildcard(Node):
    """General glob leaf (e.g. ``Wildcard("m*ge")``): ``*`` matches
    any run of token characters (including none), ``?`` exactly one.
    Expanded against the index dictionary into an OR of matching
    terms at query time — a literal prefix before the first wildcard
    range-prunes the dictionary probe; a LEADING wildcard scans the
    vocabulary (never the corpus), the same honest shape as the fuzzy
    probe.  Same TooManyClauses discipline as :class:`Prefix`
    (wildcard matches are unranked, so a cap must raise, not silently
    truncate).  ``Prefix(p)`` is exactly ``Wildcard(p + "*")`` with a
    cheaper probe.  Extension — the reference has exact term ids
    only."""

    pattern: str

    def _terms(self):
        yield from ()  # resolved during expansion, not term lookup


@dataclass(frozen=True)
class Regexp(Node):
    """Regular-expression leaf (the Lucene ``RegexpQuery`` surface,
    parser form ``/s(or|ub)t/``): the pattern is implicitly anchored
    to the WHOLE term (Lucene semantics) and expanded against the
    index dictionary into an OR of matching terms.  The accepted
    syntax is the subset common to Python ``re``, Java ``rlike``, and
    DuckDB's RE2 (no backreferences, no lookaround) so the driver
    probe, the distributed probe, and the SQL oracle all agree; a
    literal prefix before the first metacharacter range-prunes the
    dictionary scan like Wildcard.  Same raise-don't-truncate cap as
    Prefix.  Extension — the reference has exact term ids only."""

    pattern: str

    def _terms(self):
        yield from ()  # resolved during expansion, not term lookup


@dataclass(frozen=True)
class Fuzzy(Node):
    """Fuzzy-term leaf (e.g. ``Fuzzy("merg")``), expanded against the
    index dictionary into an OR of terms within edit distance 1 —
    ranked (dist asc, df desc, term asc) and CAPPED at
    ``operators.fuzzy.MAX_FUZZY_EXPANSIONS`` (Lucene FuzzyQuery
    discipline: the neighborhood is ranked, so capping keeps the best
    expansions — unlike Prefix whose unbounded ranges must raise).
    Extension — the reference hashes exact term ids only."""

    term: str

    def _terms(self):
        yield from ()  # resolved during expansion, not term lookup


def scoring_terms(node: Node) -> list[str]:
    """Distinct terms that CONTRIBUTE to the BM25 score (excludes the
    negative side of Diff)."""
    if isinstance(node, Term):
        return [node.term]
    if isinstance(node, (And, Or)):
        seen: list[str] = []
        for t in scoring_terms(node.b) + scoring_terms(node.a):
            if t not in seen:
                seen.append(t)
        return seen
    if isinstance(node, Diff):
        return scoring_terms(node.a)
    if isinstance(node, (Phrase, Near)):
        return node.terms()
    if isinstance(node, Synonym):
        return [node.key()]  # the blended pseudo-term, not the members
    if isinstance(node, (Prefix, Fuzzy, Wildcard, PhrasePrefix, Regexp)):
        return []  # resolved during expansion, before scoring
    if isinstance(node, Filter):
        return []  # filter clauses never score
    if isinstance(node, (MinShould, DisMax)):
        seen2: list[str] = []
        for c in node.clauses:
            for t in scoring_terms(c):
                if t not in seen2:
                    seen2.append(t)
        return seen2
    if isinstance(node, ConstantScore):
        # the score is a constant, but the inner terms still drive
        # snippet highlighting / significant-terms foregrounds
        return scoring_terms(node.query)
    if isinstance(node, Boosting):
        return scoring_terms(node.positive)
    raise TypeError(node)


def scoring_weights(node: Node) -> dict[str, float]:
    """Per-term query-time boost weights over the SCORING side of the
    tree (same leaf set as :func:`scoring_terms`): term -> weight,
    with unboosted terms omitted (weight 1.0).  A term reachable
    through several leaves takes the MAX of its boosts — pinned so the
    weight map is deterministic and an unboosted duplicate leaf never
    dilutes an explicit boost > 1.  The flip side is pinned too: a
    sub-1.0 DEMOTION boost is overridden by an unboosted duplicate of
    the same term (max(0.5, implicit 1.0) = 1.0) — to demote robustly
    use the Boosting query, whose factor applies per document, not per
    term weight.  Phrase/Near member terms carry no
    boost syntax and weigh 1.0; Diff's negative side never scores, so
    its boosts are ignored like its terms."""
    out: dict[str, float] = {}

    def walk(n: Node) -> None:
        if isinstance(n, Term):
            out[n.term] = max(out.get(n.term, 0.0), n.boost)
        elif isinstance(n, (And, Or)):
            walk(n.b)
            walk(n.a)
        elif isinstance(n, Diff):
            walk(n.a)
        elif isinstance(n, (MinShould, DisMax)):
            for c in n.clauses:
                walk(c)
        elif isinstance(n, Boosting):
            # the negative side only demotes; ConstantScore discards
            # its inner boosts entirely (the score is the constant)
            walk(n.positive)

    walk(node)
    return {t: w for t, w in out.items() if w != 1.0}


def to_postfix(node: Node) -> list[tuple]:
    """AST -> postfix program, e.g. [("PUSH","x"),("PUSH","y"),("AND",)].

    Inverse of :func:`from_postfix`: operand *b* (popped second) is
    emitted first, matching CHASM write order.
    """
    out: list[tuple] = []

    def walk(n: Node) -> None:
        if isinstance(n, Term):
            if n.boost != 1.0:
                raise ValueError(
                    "boosted terms have no opcode in the reference's "
                    "4-op wire format (CHASM carries bare term hashes)"
                )
            out.append(("PUSH", n.term))
        elif isinstance(n, (And, Or)):
            walk(n.b)
            walk(n.a)
            out.append(("AND",) if isinstance(n, And) else ("OR",))
        elif isinstance(
            n,
            (Diff, Prefix, Fuzzy, Wildcard, Phrase, PhrasePrefix, Near,
             Synonym, Regexp, MinShould, DisMax, ConstantScore, Boosting,
             Filter),
        ):
            raise ValueError(
                f"{type(n).__name__} is an engine extension with no "
                "opcode in the reference's 4-op wire format"
            )
        else:
            raise TypeError(f"unknown node {n!r}")

    walk(node)
    return out


def from_postfix(program: list[tuple]) -> Node:
    """Postfix program -> AST (the chasm_interpret dispatch,
    `chasm.chpl:175-183`): AND/OR build Node(pop(), pop())."""
    stack: list[Node] = []
    for op in program:
        kind = op[0]
        if kind == "PUSH":
            stack.append(Term(op[1]))
        elif kind == "AND":
            stack.append(And(stack.pop(), stack.pop()))
        elif kind == "OR":
            stack.append(Or(stack.pop(), stack.pop()))
        elif kind == "HALT":
            break
        else:
            raise ValueError(f"unknown opcode {kind!r}")
    if len(stack) != 1:
        raise ValueError(f"malformed program, stack depth {len(stack)}")
    return stack[0]


def has_positional(node: Node) -> bool:
    """True when the tree contains a Phrase/Near leaf — evaluating it
    needs the stored positions columns in the segment scan."""
    if isinstance(node, (Phrase, Near)):
        return True
    if isinstance(node, (And, Or, Diff)):
        return has_positional(node.a) or has_positional(node.b)
    return any(has_positional(c) for c in _children(node))


def positional_terms(node: Node) -> set[str]:
    """Terms whose OCCURRENCE KEYS (positions) a positional kernel
    must decode — only Phrase/Near member terms, so a mixed tree
    (``And(Phrase(...), Term("hot"))``) never pays the position
    decode for its plain-term side."""
    if isinstance(node, Phrase):
        return set(node.words)
    if isinstance(node, Near):
        return {node.a, node.b}
    if isinstance(node, (And, Or, Diff)):
        return positional_terms(node.a) | positional_terms(node.b)
    out: set[str] = set()
    for c in _children(node):
        out |= positional_terms(c)
    return out


def all_terms_required(node: Node) -> bool:
    """True when EVERY term the tree yields must appear in a matching
    segment — pure conjunctions whose leaves are Term, Phrase, or
    Near (a phrase doc contains every member word; a NEAR doc both
    operands).  Lets segment pruning (directory/blooms) INTERSECT the
    per-term candidate sets instead of unioning them; strictly
    generalizes ``conjunctive_terms(node) is not None`` (which must
    stay Term-only: the WAND fast path it guards scores plain AND
    semantics and would drop the position filter)."""
    if isinstance(node, (Term, Phrase, Near)):
        return True
    if isinstance(node, And):
        return all_terms_required(node.a) and all_terms_required(node.b)
    if isinstance(node, Filter):
        # a filter doc must still CONTAIN the filtered terms
        return all_terms_required(node.query)
    return False


def conjunctive_terms(node: Node) -> list[str] | None:
    """If `node` is a pure AND tree, its distinct terms; else None.
    (n-ary folding for the WAND conjunctive kernel, SURVEY §7.1 P3)."""
    if isinstance(node, Term):
        return [node.term]
    if isinstance(node, And):
        a = conjunctive_terms(node.a)
        b = conjunctive_terms(node.b)
        if a is None or b is None:
            return None
        seen: list[str] = []
        for t in b + a:
            if t not in seen:
                seen.append(t)
        return seen
    return None


def disjunctive_terms(node: Node) -> list[str] | None:
    """If `node` is a pure OR tree, its distinct terms; else None."""
    if isinstance(node, Term):
        return [node.term]
    if isinstance(node, Or):
        a = disjunctive_terms(node.a)
        b = disjunctive_terms(node.b)
        if a is None or b is None:
            return None
        seen: list[str] = []
        for t in b + a:
            if t not in seen:
                seen.append(t)
        return seen
    return None
