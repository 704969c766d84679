"""Single-node oracle: the pinned spec implemented twice (SURVEY §7.0).

This is the *small* implementation (pure python/pandas-free data
structures) that pytest compares the distributed engine against:

* :class:`OracleIndex` — in-memory inverted index over (doc_id, text)
  rows, BM25 top-k search with the pinned constants.
* Parity mode — a faithful behavioral transcription of the reference's
  pull-iterator operand protocol (`operands.chpl:26-160`,
  `memorysegment.chpl:21-56`): newest-document-first emission, OR
  without dedup (ties: opA first), AND alternating dual-emit.  Used by
  the helloworld golden test (README.md:109-124).

Everything numeric routes through :mod:`chearch_spark.spec` so the
engine and oracle cannot drift.
"""

from __future__ import annotations

from collections import Counter

from chearch_spark import spec
from chearch_spark.plans.query import (
    And,
    Boosting,
    ConstantScore,
    Diff,
    DisMax,
    Filter,
    MinShould,
    Node,
    Or,
    Synonym,
    Term,
    has_structured_scoring,
    scoring_terms,
    scoring_weights,
    synonym_leaves,
)


class OracleIndex:
    """In-memory index: insertion order defines doc_index (newest = max)."""

    def __init__(self) -> None:
        self.doc_ids: list[int] = []  # doc_index -> external doc id
        self.doc_len: list[int] = []  # raw token counts (uncapped)
        self.sha256: list[str] = []
        # term -> list[(doc_index, position)] in insertion order,
        # positions only recorded while <= MAX_POSITION (8-bit parity)
        self.positions: dict[str, list[tuple[int, int]]] = {}
        # term -> {doc_index: raw tf (uncapped)}
        self.tf: dict[str, dict[int, int]] = {}

    # -- build ----------------------------------------------------------
    def add_document(self, external_doc_id: int, text: str) -> None:
        tokens = spec.tokenize(text)
        self.add_pretokenized(external_doc_id, list(enumerate(tokens)))
        self.sha256[-1] = spec.content_sha256(text)

    def add_pretokenized(
        self, external_doc_id: int, term_positions: list[tuple[int, str]]
    ) -> None:
        """Reference-style ingest: explicit (position, term) pairs
        (`searchindex.chpl:55-64` addDocument)."""
        doc_index = len(self.doc_ids)
        self.doc_ids.append(external_doc_id)
        self.doc_len.append(len(term_positions))
        self.sha256.append("")
        counts = Counter(t for _, t in term_positions)
        for pos, term in term_positions:
            if pos <= spec.MAX_POSITION:
                self.positions.setdefault(term, []).append((doc_index, pos))
        for term, c in counts.items():
            self.tf.setdefault(term, {})[doc_index] = (
                self.tf.get(term, {}).get(doc_index, 0) + c
            )

    @classmethod
    def from_rows(cls, rows) -> "OracleIndex":
        ix = cls()
        for doc_id, text in rows:
            ix.add_document(doc_id, text)
        return ix

    # -- stats ----------------------------------------------------------
    @property
    def n_docs(self) -> int:
        return len(self.doc_ids)

    @property
    def avgdl(self) -> float:
        return sum(self.doc_len) / self.n_docs if self.doc_ids else 0.0

    def df(self, term: str) -> int:
        return len(self.tf.get(term, {}))

    # -- BM25 search ----------------------------------------------------
    def doc_set(self, node: Node) -> set[int]:
        if isinstance(node, Term):
            return set(self.tf.get(node.term, {}))
        if isinstance(node, And):
            return self.doc_set(node.a) & self.doc_set(node.b)
        if isinstance(node, Or):
            return self.doc_set(node.a) | self.doc_set(node.b)
        if isinstance(node, Diff):
            return self.doc_set(node.a) - self.doc_set(node.b)
        if isinstance(node, Synonym):
            out: set[int] = set()
            for m in node.words:
                out |= set(self.tf.get(m, {}))
            return out
        if isinstance(node, MinShould):
            sets = [self.doc_set(c) for c in node.clauses]
            return {
                d
                for d in set().union(*sets)
                if sum(d in s for s in sets) >= node.m
            }
        if isinstance(node, DisMax):
            return set().union(*(self.doc_set(c) for c in node.clauses))
        if isinstance(node, ConstantScore):
            return self.doc_set(node.query)
        if isinstance(node, Boosting):
            return self.doc_set(node.positive)
        if isinstance(node, Filter):
            return self.doc_set(node.query)
        raise TypeError(node)

    def score(
        self,
        node: Node,
        doc_index: int,
        _weights: dict[str, float] | None = None,
        _syn: dict | None = None,
    ) -> float:
        """Pinned scoring: sum of BM25 contributions over the query's
        DISTINCT scoring terms present in the doc (spec §F4) — with
        query-time boosts multiplying the term's idf (the engine's
        `_weighted_idfs` seam) and Synonym leaves blended as ONE
        pseudo-term (tf = sum of member tfs, df = max member df).
        Scoring COMBINATORS recurse structurally; ``_weights``/``_syn``
        thread the ROOT tree's boost map and synonym leaves down the
        recursion because the engine weights idfs once for the whole
        query, not per clause."""
        # root weights/synonyms, shared by every nested clause — the
        # engine's single _weighted_idfs view of the whole tree
        weights = scoring_weights(node) if _weights is None else _weights
        syn = (
            {s.key(): s for s in synonym_leaves(node)}
            if _syn is None
            else _syn
        )
        if isinstance(node, (And, Or, Diff)) and has_structured_scoring(
            node
        ):
            # mixed tree: sides combine additively (Diff: positive side
            # only); a structured side is masked by its own doc set, a
            # flat side keeps the pinned flat term-sum
            def side(c: Node) -> float:
                if has_structured_scoring(c):
                    return (
                        self.score(c, doc_index, weights, syn)
                        if doc_index in self.doc_set(c)
                        else 0.0
                    )
                return self.score(c, doc_index, weights, syn)

            if isinstance(node, Diff):
                return side(node.a)
            return side(node.a) + side(node.b)
        if isinstance(node, MinShould):
            total = 0.0
            for c in node.clauses:
                if doc_index in self.doc_set(c):
                    total += self.score(c, doc_index, weights, syn)
            return total
        if isinstance(node, DisMax):
            vals = [
                self.score(c, doc_index, weights, syn)
                if doc_index in self.doc_set(c)
                else 0.0
                for c in node.clauses
            ]
            mx = vals[0]
            sm = vals[0]
            for v in vals[1:]:
                mx = max(mx, v)
                sm = sm + v
            return mx + node.tie * (sm - mx)
        if isinstance(node, ConstantScore):
            return (
                node.boost if doc_index in self.doc_set(node.query) else 0.0
            )
        if isinstance(node, Boosting):
            pos = (
                self.score(node.positive, doc_index, weights, syn)
                if doc_index in self.doc_set(node.positive)
                else 0.0
            )
            return pos * (
                node.negative_boost
                if doc_index in self.doc_set(node.negative)
                else 1.0
            )
        total = 0.0
        avgdl = self.avgdl
        for term in scoring_terms(node):
            if term in syn:
                leaf = syn[term]
                tf = sum(
                    self.tf.get(m, {}).get(doc_index, 0)
                    for m in leaf.words
                )
                df = max((self.df(m) for m in leaf.words), default=0)
                if tf and df:
                    total += spec.bm25_term_score(
                        float(tf), float(self.doc_len[doc_index]), avgdl,
                        spec.idf(self.n_docs, df),
                    )
                continue
            tf = self.tf.get(term, {}).get(doc_index)
            if tf:
                total += spec.bm25_term_score(
                    float(tf), float(self.doc_len[doc_index]), avgdl,
                    spec.idf(self.n_docs, self.df(term))
                    * weights.get(term, 1.0),
                )
        return total

    def search(self, node: Node, k: int = spec.DEFAULT_K) -> list[tuple[int, float]]:
        """Top-k (external_doc_id, score), tie-break (score desc, doc_id asc)."""
        scored = [
            (self.doc_ids[d], self.score(node, d)) for d in self.doc_set(node)
        ]
        scored.sort(key=lambda r: (-r[1], r[0]))
        return scored[:k]

    # -- parity mode (reference pull protocol) ---------------------------
    def parity_search(self, node: Node) -> list[tuple[str, int, int]]:
        """Occurrence rows (term, textLocation, externalDocId) in exact
        reference emission order (newest-first; OR no-dedup; AND
        alternating dual-emit — `operands.chpl:52-160`)."""
        op = self._operand(node)
        return [
            (term, pos, self.doc_ids[d]) for (term, pos, d) in _evaluate(op)
        ]

    def _operand(self, node: Node) -> "_Operand":
        if isinstance(node, Term):
            occ = self.positions.get(node.term)
            if not occ:
                return _Operand()  # Null operand (memorysegment.chpl:316)
            # newest-first: reverse insertion order (backward block scan,
            # memorysegment.chpl:41-55)
            vals = [(node.term, pos, d) for (d, pos) in reversed(occ)]
            return _TermOperand(vals)
        if isinstance(node, And):
            return _IntersectionOperand(self._operand(node.a), self._operand(node.b))
        if isinstance(node, Or):
            return _UnionOperand(self._operand(node.a), self._operand(node.b))
        raise TypeError(node)


# ---------------------------------------------------------------------
# Pull-iterator operand protocol (behavioral transcription of
# operands.chpl — written from observed semantics, not the source text).
# Values are (term, pos, doc_index); "same document" compares doc_index
# only (the reference's 24-bit LSB mask, documentid.chpl:26).


class _Operand:
    """Base = Null operand (operands.chpl:26-50)."""

    def has_value(self) -> bool:
        return False

    def get_value(self):
        raise RuntimeError("iterated too far")

    def advance(self) -> None:
        raise RuntimeError("iterated too far")


def _evaluate(op: _Operand):
    while op.has_value():
        yield op.get_value()
        op.advance()


def _doc(op: _Operand) -> int:
    return op.get_value()[2]


class _TermOperand(_Operand):
    def __init__(self, values: list[tuple[str, int, int]]) -> None:
        self._values = values
        self._i = 0

    def has_value(self) -> bool:
        return self._i < len(self._values)

    def get_value(self):
        return self._values[self._i]

    def advance(self) -> None:
        self._i += 1


class _UnionOperand(_Operand):
    """Merge descending doc_index; ties -> opA; NO dedup
    (operands.chpl:52-100)."""

    def __init__(self, op_a: _Operand, op_b: _Operand) -> None:
        self.op_a, self.op_b = op_a, op_b
        self.cur = self._next_operand()

    def _next_operand(self):
        a, b = self.op_a, self.op_b
        if a.has_value() and b.has_value():
            return a if _doc(a) >= _doc(b) else b
        if a.has_value():
            return a
        if b.has_value():
            return b
        return None

    def has_value(self) -> bool:
        return self.cur is not None

    def get_value(self):
        return self.cur.get_value()

    def advance(self) -> None:
        self.cur.advance()
        self.cur = self._next_operand()


class _IntersectionOperand(_Operand):
    """Sorted-merge intersection with alternating dual-emit on a doc
    match (operands.chpl:102-160)."""

    def __init__(self, op_a: _Operand, op_b: _Operand) -> None:
        self.op_a, self.op_b = op_a, op_b
        self.cur = None
        self.cur = self._next_operand()

    def _next_operand(self):
        a, b = self.op_a, self.op_b
        while a.has_value() and b.has_value():
            da, db = _doc(a), _doc(b)
            if da > db:
                a.advance()
            elif da == db:
                if self.cur is not None and _doc(self.cur) == da:
                    if self.cur is a:
                        a.advance()
                        return b
                    b.advance()
                    return a
                return a
            else:
                b.advance()
        return None

    def has_value(self) -> bool:
        return self.cur is not None

    def get_value(self):
        return self.cur.get_value()

    def advance(self) -> None:
        self.cur = self._next_operand()
