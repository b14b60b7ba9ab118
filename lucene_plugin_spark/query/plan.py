"""Query plan nodes — the analogue of Lucene's Query tree produced by the
classic QueryParser (parsed at LuceneIndexBean.java:383).

Semantics replicated from the reference (SURVEY.md §2.4):
- default field ``text`` (parser built at LuceneIndexBean.java:727-735);
- default operator OR (SHOULD) — scores of matching clauses are summed;
- MUST (+/AND), MUST_NOT (-/NOT) boolean clauses;
- phrase queries with positions (position increments preserved over removed
  stopwords);
- inclusive lexicographic term ranges ``field:[lo TO hi]``
  (TestSearchMap.java:51-58 pins string-range semantics);
- range / phrase / term all constrained to one field.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

DEFAULT_FIELD = "text"


@dataclass(frozen=True)
class Node:
    pass


@dataclass(frozen=True)
class Term(Node):
    field: str
    term: str


@dataclass(frozen=True)
class Phrase(Node):
    field: str
    terms: tuple[str, ...]       # analyzed terms
    offsets: tuple[int, ...]     # position offsets (gaps where stopwords fell out)


@dataclass(frozen=True)
class Range(Node):
    field: str
    lo: str
    hi: str
    include_lo: bool = True
    include_hi: bool = True


@dataclass(frozen=True)
class Bool(Node):
    """should: scored union; must: required (scored); must_not: excluded."""
    should: tuple[Node, ...] = ()
    must: tuple[Node, ...] = ()
    must_not: tuple[Node, ...] = ()


def iter_positive_leaves(node: Node):
    """All scoring leaves (Term/Phrase/Range) outside MUST_NOT clauses."""
    if isinstance(node, (Term, Phrase, Range)):
        yield node
    elif isinstance(node, Bool):
        for c in node.should + node.must:
            yield from iter_positive_leaves(c)


def iter_all_leaves(node: Node):
    if isinstance(node, (Term, Phrase, Range)):
        yield node
    elif isinstance(node, Bool):
        for c in node.should + node.must + node.must_not:
            yield from iter_all_leaves(c)
