"""Surround query language — the lucene queryparser ``surround`` package
(shipped in 5.2 beside the classic parser): an explicit-operator proximity
language over span queries.

Grammar subset replicated from ``surround/parser/QueryParser.jj``:

- ``OR`` < ``AND`` < ``NOT`` precedence ladder, each left-associative and
  EXPLICIT — surround has no implicit operator, ``a b`` is a parse error;
- prefix boolean forms ``AND(q, q, ...)`` / ``OR(q, q, ...)``;
- distance operators, prefix ``3N(t, t, ...)`` / ``3W(t, t, ...)`` and
  infix ``t 3N t`` (same-operator chains extend the operand list): ``N`` =
  unordered within the distance, ``W`` = ordered ("wide"), distance 1-99;
  surround maps distance ``d`` to ``SpanNearQuery(slop = d - 1)``
  (``DistanceQuery.getSpanNearQuery``), and so do we — onto the engine's
  span/sloppy-phrase machinery (``W`` = consecutive expected offsets,
  ``N`` = all-zero offsets, anchor-displacement sloppyFreq; the documented
  deviation from Lucene's greedy span enumeration applies);
- parentheses for grouping; ``*``/``?`` truncation in boolean contexts
  maps to the engine's sargable/gram-routed ``Wildcard`` expansion;
- operators are case-insensitive (``and``, ``3n``); terms are analyzed
  with the index's chain like every other parser here (surround itself
  passes text through unanalyzed — documented deviation, keeps the five
  parsers mutually consistent).

Restrictions (raise :class:`SurroundParseError`): distance-operator
operands must be single analyzed terms (Lucene's nested-span and
truncated-span operands are out of scope), and the empty query is an
error.  Everything compiles to ONE plan tree (Bool / Phrase / Term /
Wildcard) evaluated by ``SearchEngine.search_node`` — booleans over spans
ride the same recursive BooleanWeight machinery as ``ft_nested``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from lucene_plugin_spark.analysis.tokenizer import tokenize_text
from lucene_plugin_spark.query.plan import (DEFAULT_FIELD, Bool, Node,
                                            Phrase, Term, Wildcard)


class SurroundParseError(ValueError):
    pass


_TOK_RE = re.compile(
    r"\s*(?:(?P<lp>\()|(?P<rp>\))|(?P<comma>,)"
    r"|(?P<dist>\d{1,2})(?P<dkind>[nNwW])\b"
    r"|(?P<word>[^\s(),]+))")


def _lex(q: str):
    out, i = [], 0
    while i < len(q):
        m = _TOK_RE.match(q, i)
        if m is None or m.end() == i:
            if q[i:].isspace():
                break
            raise SurroundParseError(f"cannot lex at {q[i:]!r}")
        if m.group("lp"):
            out.append(("lp", "("))
        elif m.group("rp"):
            out.append(("rp", ")"))
        elif m.group("comma"):
            out.append(("comma", ","))
        elif m.group("dist"):
            out.append(("dist", (int(m.group("dist")),
                                 m.group("dkind").lower())))
        else:
            w = m.group("word")
            lw = w.lower()
            if lw in ("and", "or", "not"):
                out.append(("bool", lw))
            else:
                out.append(("word", w))
        i = m.end()
    return out


class _P:
    def __init__(self, q: str, field: str, variant: str):
        self.toks = _lex(q)
        self.i = 0
        self.field = field
        self.variant = variant

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        if t[0] is None:
            raise SurroundParseError("unexpected end of query")
        self.i += 1
        return t

    # -- precedence ladder: or < and < not < distance < primary ----------
    def parse(self) -> Node:
        n = self.or_q()
        if self.peek()[0] is not None:
            raise SurroundParseError(
                f"trailing input at {self.toks[self.i]!r}")
        return n

    def or_q(self) -> Node:
        parts = [self.and_q()]
        while self.peek() == ("bool", "or"):
            self.take()
            parts.append(self.and_q())
        return parts[0] if len(parts) == 1 else Bool(should=tuple(parts))

    def and_q(self) -> Node:
        parts = [self.not_q()]
        while self.peek() == ("bool", "and"):
            self.take()
            parts.append(self.not_q())
        return parts[0] if len(parts) == 1 else Bool(must=tuple(parts))

    def not_q(self) -> Node:
        n = self.dist_q()
        negs = []
        while self.peek() == ("bool", "not"):
            self.take()
            negs.append(self.dist_q())
        if not negs:
            return n
        return Bool(must=(n,), must_not=tuple(negs))

    def dist_q(self) -> Node:
        n = self.primary()
        kind = None
        terms = None
        while self.peek()[0] == "dist":
            d, k = self.take()[1]
            if terms is None:
                terms = [self._as_span_term(n)]
                kind = (d, k)
            elif (d, k) != kind:
                raise SurroundParseError(
                    "mixed infix distance operators need parentheses")
            terms.append(self._as_span_term(self.primary()))
        if terms is None:
            return n
        return self._distance(kind[0], kind[1], terms)

    def primary(self) -> Node:
        kind, v = self.take()
        if kind == "lp":
            n = self.or_q()
            if self.take()[0] != "rp":
                raise SurroundParseError("unbalanced parenthesis")
            return n
        if kind == "bool" and v in ("and", "or") and self.peek() == ("lp", "("):
            args = self._arg_list(self.or_q)
            return (Bool(must=tuple(args)) if v == "and"
                    else Bool(should=tuple(args)))
        if kind == "dist" and self.peek() == ("lp", "("):
            d, k = v
            args = self._arg_list(self.or_q)
            return self._distance(d, k, [self._as_span_term(a)
                                         for a in args])
        if kind == "word" or (kind == "bool" and self.peek() != ("lp", "(")):
            return self._word_leaf(v)
        if kind == "dist":
            raise SurroundParseError(
                f"distance operator {v[0]}{v[1]} needs operands")
        raise SurroundParseError(f"unexpected token {v!r}")

    # -- helpers ----------------------------------------------------------
    def _arg_list(self, sub):
        self.take()                    # '('
        args = [sub()]
        while self.peek() == ("comma", ","):
            self.take()
            args.append(sub())
        if self.take()[0] != "rp":
            raise SurroundParseError("unbalanced prefix-operator call")
        return args

    def _word_leaf(self, w: str) -> Node:
        lw = w.lower()
        if "*" in lw or "?" in lw:
            return Wildcard(field=self.field, pattern=lw)
        analyzed = tokenize_text(lw, variant=self.variant)
        if len(analyzed) != 1:
            raise SurroundParseError(
                f"term {w!r} does not analyze to one token")
        return Term(field=self.field, term=analyzed[0][0])

    def _as_span_term(self, n: Node) -> str:
        if not isinstance(n, Term):
            raise SurroundParseError(
                "distance operands must be single terms")
        return n.term

    def _distance(self, d: int, k: str, terms: list[str]) -> Node:
        if not (1 <= d <= 99):
            raise SurroundParseError(f"distance must be 1..99, got {d}")
        if len(terms) < 2:
            raise SurroundParseError(
                "distance operators need at least two operands")
        ts = tuple(terms)
        offsets = (tuple(range(len(ts))) if k == "w" else (0,) * len(ts))
        return Phrase(field=self.field, terms=ts, offsets=offsets,
                      slop=d - 1)


def parse_surround(q: str, default_field: str = DEFAULT_FIELD,
                   variant: str = "standard") -> Node:
    """Parse a surround query; raises :class:`SurroundParseError` (the
    surround parser is strict, unlike SimpleQueryParser)."""
    if not q or not q.strip():
        raise SurroundParseError("empty query")
    return _P(q, default_field, variant).parse()


def surround_search(engine, repo: str | None, query: str,
                    limit: int = 255) -> DataFrame:
    """Parse with :func:`parse_surround` and run the resulting plan through
    the ordinary engine (driver fast path / kernels / nested machinery)."""
    node = parse_surround(query, variant=engine.analyzer)
    return engine.search_node(node, repo, limit)
