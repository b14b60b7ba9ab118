"""Pure-Python reference engine (the stand-in for the reference Lucene
engine's results — SURVEY.md §5.2 "rank-identity oracle").

A tiny in-memory inverted index with *exactly* the semantics our Spark engine
must reproduce: same analyzer, same BM25 (k1=1.2, b=0.75, per-field stats),
same boolean / phrase / range behavior, same (score desc, doc_id asc)
ordering.  No Spark, no numpy hot loops needed — corpora here are test-sized.

The behavioral semantics replicate the reference plugin (upsert last-write-
wins by (collection, id): LuceneIndexBean.java:256,343; collection isolation:
:385-393; delete/clear: :462-540), so pytest can replay the reference's JUnit
scenarios (SURVEY.md §5) against both this oracle and the Spark engine.
"""

from __future__ import annotations

import math
from collections import defaultdict
from dataclasses import dataclass, field

from lucene_plugin_spark.analysis.tokenizer import tokenize_text
from lucene_plugin_spark.query import bm25
from lucene_plugin_spark.query.expand import EXPANDABLE, exp_match
from lucene_plugin_spark.query.parser import parse_query, sanitize_collection
from lucene_plugin_spark.query.plan import (Bool, MatchAll, Node, Phrase,
                                            Range, SynSet, Term)


@dataclass
class OracleDoc:
    doc_id: int
    repo: str
    path: str
    # field -> [(term, pos), ...]
    tokens: dict[str, list[tuple[str, int]]] = field(default_factory=dict)


class OracleEngine:
    def __init__(self, analyzer: str = "standard"):
        self.docs: dict[int, OracleDoc] = {}
        self.by_key: dict[tuple[str, str], int] = {}
        self._next_id = 0
        self.analyzer = analyzer  # must match the engine under test

    # ------------------------------------------------------------- indexing
    def index_doc(self, repo: str, path: str, fields: dict[str, str],
                  doc_id: int | None = None) -> int:
        """Upsert by (repo, path) — last write wins, old terms gone.

        When ``doc_id`` is given (bulk-load path) it is used verbatim so the
        oracle's ids line up with the engine's deterministic assignment.
        """
        key = (repo, path)
        if key in self.by_key:
            del self.docs[self.by_key[key]]
            del self.by_key[key]
        if doc_id is None:
            doc_id = self._next_id
            self._next_id += 1
        else:
            self._next_id = max(self._next_id, doc_id + 1)
        d = OracleDoc(doc_id=doc_id, repo=repo, path=path)
        for f, text in fields.items():
            if text is not None:
                toks = tokenize_text(text, variant=self.analyzer)
                if toks:  # a field with zero surviving tokens has no postings
                    d.tokens[f] = toks
        self.docs[doc_id] = d
        self.by_key[key] = doc_id
        return doc_id

    def delete(self, repo: str, path: str) -> bool:
        key = (repo, path)
        if key in self.by_key:
            did = self.by_key.pop(key)
            del self.docs[did]
            return True
        return False

    def clear(self, repo: str) -> None:
        for key in [k for k in self.by_key if k[0] == repo]:
            del self.docs[self.by_key.pop(key)]

    # ---------------------------------------------------------------- stats
    def _field_stats(self, f: str) -> tuple[float, float]:
        lens = [len(d.tokens[f]) for d in self.docs.values() if f in d.tokens]
        if not lens:
            return 0.0, 1.0
        return float(len(lens)), sum(lens) / len(lens)

    def _df(self, f: str, term: str) -> int:
        return sum(1 for d in self.docs.values()
                   if f in d.tokens and any(t == term for t, _ in d.tokens[f]))

    def _all_terms(self, f: str) -> set[str]:
        out = set()
        for d in self.docs.values():
            out.update(t for t, _ in d.tokens.get(f, []))
        return out

    # --------------------------------------------------------------- search
    def search(self, repo: str | None, query: str, limit: int = 255
               ) -> list[tuple[int, str, float]]:
        """[(doc_id, path, score)] ordered score desc, doc_id asc, top-k.

        Evaluated with the RECURSIVE Lucene BooleanWeight/BS2 semantics
        (``_eval_node``) so nested parenthesized queries gate correctly —
        e.g. ``(alpha beta) AND gamma`` requires the inner disjunction."""
        node = parse_query(query, variant=self.analyzer)
        docs = [d for d in self.docs.values() if repo is None or d.repo == repo]
        hits = self._eval_node(node, docs)
        ranked = sorted(((s, d) for d, s in hits.items()),
                        key=lambda x: (-x[0], x[1]))[:limit]
        return [(d, self.docs[d].path, s) for s, d in ranked]

    def _eval_node(self, node: Node, docs) -> dict[int, float]:
        """Recursive Lucene semantics: per Bool node every MUST/FILTER child
        matches, no MUST_NOT child matches, #matching SHOULD >=
        max(minimumNumberShouldMatch, 1 if no MUST/FILTER else 0); score =
        Σ matching MUST + SHOULD child scores (FILTER gates at 0).  DisMax:
        max + tie × (sum of the other children)."""
        from lucene_plugin_spark.query.plan import DisMax
        if isinstance(node, DisMax):
            per = [self._eval_node(c, docs) for c in node.disjuncts]
            out: dict[int, float] = {}
            for did in set().union(*per) if per else set():
                vals = [p.get(did, 0.0) for p in per if did in p]
                mx = max(vals)
                out[did] = mx + node.tie * (sum(vals) - mx)
            return out
        if not isinstance(node, Bool):
            return dict(self._leaf_hits(node, docs))
        mu = [self._eval_node(c, docs) for c in node.must]
        fl = [self._eval_node(c, docs) for c in node.filter]
        sh = [self._eval_node(c, docs) for c in node.should]
        base: set[int] | None = None
        for h in mu + fl:
            base = set(h) if base is None else (base & set(h))
        cnt: dict[int, int] = defaultdict(int)
        ssum: dict[int, float] = defaultdict(float)
        for h in sh:
            for did, sc in h.items():
                cnt[did] += 1
                ssum[did] += sc
        eff_mm = max(node.min_should, 0 if base is not None else 1)
        if base is None:
            final = {d for d, c in cnt.items() if c >= eff_mm}
        elif eff_mm > 0:
            final = {d for d in base if cnt.get(d, 0) >= eff_mm}
        else:
            final = set(base)
        out = {}
        for d in final:
            sc = ssum.get(d, 0.0)
            for h in mu:
                sc += h[d]
            out[d] = sc
        for c in node.must_not:
            for d in self._eval_node(c, docs):
                out.pop(d, None)
        return out

    def search_min_match(self, repo: str | None, query: str, min_should: int,
                         limit: int = 255) -> list[tuple[int, str, float]]:
        """search() + Lucene minimumNumberShouldMatch over SHOULD leaves."""
        node = parse_query(query, variant=self.analyzer)
        docs = [d for d in self.docs.values() if repo is None or d.repo == repo]
        should, must, must_not = self._flatten(node)
        scored: dict[int, float] = defaultdict(float)
        should_hits = []
        for leaf in should:
            hits = self._leaf_hits(leaf, docs)
            should_hits.append(set(hits))
            for did, sc in hits.items():
                scored[did] += sc
        result_ids = {d for d in scored
                      if sum(d in s for s in should_hits) >= min_should}
        for leaf in must:
            hits = self._leaf_hits(leaf, docs)
            for did, sc in hits.items():
                scored[did] += sc
            result_ids &= set(hits)
        for leaf in must_not:
            result_ids -= set(self._leaf_hits(leaf, docs))
        ranked = sorted(((scored[d], d) for d in result_ids),
                        key=lambda x: (-x[0], x[1]))[:limit]
        return [(d, self.docs[d].path, s) for s, d in ranked]

    def search_filtered(self, repo: str | None, query: str, filter_query: str,
                        limit: int = 255) -> list[tuple[int, str, float]]:
        """search() restricted to docs matching filter_query (FILTER clause:
        required, non-scoring)."""
        docs = [d for d in self.docs.values() if repo is None or d.repo == repo]
        fs, fm, fn = self._flatten(parse_query(filter_query))
        allowed: set[int] | None = None
        matched: set[int] = set()
        for leaf in fs:
            matched |= set(self._leaf_hits(leaf, docs))
        allowed = matched if fs else None
        for leaf in fm:
            hits = set(self._leaf_hits(leaf, docs))
            allowed = hits if allowed is None else (allowed & hits)
        for leaf in fn:
            if allowed is not None:
                allowed -= set(self._leaf_hits(leaf, docs))
        full = self.search(repo, query, limit=len(self.docs) + 1)
        out = [(d, p, s) for d, p, s in full
               if allowed is not None and d in allowed]
        return out[:limit]

    def search_synonyms(self, repo: str | None, query: str,
                        synonyms: dict[str, list[str]], limit: int = 255
                        ) -> list[tuple[int, str, float]]:
        """search() with Term leaves in ``synonyms`` scored as SynonymQuery
        (tf = Σ member tfs, df = max member df)."""
        node = parse_query(query, variant=self.analyzer)
        docs = [d for d in self.docs.values() if repo is None or d.repo == repo]
        should, must, must_not = self._flatten(node)

        def syn_of(leaf):
            if isinstance(leaf, Term) and leaf.term in synonyms:
                members = tuple(dict.fromkeys([leaf.term]
                                              + list(synonyms[leaf.term])))
                return SynSet(field=leaf.field, terms=members, boost=leaf.boost)
            return leaf

        scored: dict[int, float] = defaultdict(float)
        matched: set[int] = set()
        must_sets = []
        for leaf in should:
            hits = self._leaf_hits(syn_of(leaf), docs)
            for did, sc in hits.items():
                scored[did] += sc
                matched.add(did)
        for leaf in must:
            hits = self._leaf_hits(syn_of(leaf), docs)
            for did, sc in hits.items():
                scored[did] += sc
                matched.add(did)
            must_sets.append(set(hits))
        result_ids = set(matched)
        for ms in must_sets:
            result_ids &= ms
        for leaf in must_not:
            result_ids -= set(self._leaf_hits(leaf, docs))
        ranked = sorted(((scored[d], d) for d in result_ids),
                        key=lambda x: (-x[0], x[1]))[:limit]
        return [(d, self.docs[d].path, s) for s, d in ranked]

    def search_dismax(self, repo: str | None, queries: list[str],
                      tie: float = 0.0, limit: int = 255
                      ) -> list[tuple[int, str, float]]:
        """DisjunctionMaxQuery: per-doc max disjunct score + tie×(others).
        Disjuncts are arbitrary queries (evaluated recursively) — Lucene
        places no shape restriction on them."""
        docs = [d for d in self.docs.values() if repo is None or d.repo == repo]
        per_q = [self._eval_node(parse_query(q), docs) for q in queries]
        out = []
        for did in (set().union(*per_q) if per_q else set()):
            vals = [pq[did] for pq in per_q if did in pq]
            mx = max(vals)
            out.append((mx + tie * (sum(vals) - mx), did))
        ranked = sorted(out, key=lambda x: (-x[0], x[1]))[:limit]
        return [(d, self.docs[d].path, s) for s, d in ranked]

    def _flatten(self, node: Node):
        should, must, must_not = [], [], []

        def walk(n, pol):
            if isinstance(n, Bool):
                for c in n.should:
                    walk(c, pol if pol == "must_not" else "should")
                for c in n.must:
                    walk(c, pol if pol == "must_not" else "must")
                for c in n.must_not:
                    walk(c, "must_not")
            else:
                {"should": should, "must": must, "must_not": must_not}[pol].append(n)

        walk(node, "should")
        return should, must, must_not

    def _leaf_hits(self, leaf: Node, docs: list[OracleDoc]) -> dict[int, float]:
        boost = getattr(leaf, "boost", 1.0)
        if isinstance(leaf, Term):
            hits = self._term_hits(leaf.field, leaf.term, docs)
        elif isinstance(leaf, SynSet):
            # SynonymQuery: tf = Σ member tfs, df = max member df
            f = leaf.field
            n, avgdl = self._field_stats(f)
            df = max((self._df(f, t) for t in leaf.terms), default=0)
            hits = {}
            if df and n:
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                for d in docs:
                    toks = d.tokens.get(f)
                    if not toks:
                        continue
                    tf = sum(1 for t, _ in toks if t in leaf.terms)
                    if tf:
                        dl = float(len(toks))
                        hits[d.doc_id] = idf * (
                            tf * (bm25.K1 + 1)
                            / (tf + bm25.K1 * (1 - bm25.B
                                               + bm25.B * dl / avgdl)))
        elif isinstance(leaf, EXPANDABLE):
            # Range/Wildcard/Fuzzy: constant-score rewrite over the expansion
            terms = {t for t in self._all_terms(leaf.field)
                     if exp_match(leaf, leaf.field, t)}
            hits = {}
            for d in docs:
                if terms & {x for x, _ in d.tokens.get(leaf.field, [])}:
                    hits[d.doc_id] = 1.0
        elif isinstance(leaf, Phrase):
            hits = self._phrase_hits(leaf, docs)
        elif isinstance(leaf, MatchAll):
            # MatchAllDocsQuery as a LEAF inside a tree (SimpleQueryParser
            # negation wrap): every doc at constant 1.0 (x boost below)
            hits = {d.doc_id: 1.0 for d in docs}
        else:
            raise TypeError(leaf)
        if boost != 1.0:
            hits = {k: v * boost for k, v in hits.items()}
        return hits

    def _term_hits(self, f: str, term: str, docs: list[OracleDoc]) -> dict[int, float]:
        n, avgdl = self._field_stats(f)
        df = self._df(f, term)
        if df == 0 or n == 0:
            return {}
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        out = {}
        for d in docs:
            toks = d.tokens.get(f)
            if not toks:
                continue
            tf = sum(1 for t, _ in toks if t == term)
            if tf:
                dl = float(len(toks))
                out[d.doc_id] = idf * (tf * (bm25.K1 + 1)
                                       / (tf + bm25.K1 * (1 - bm25.B + bm25.B * dl / avgdl)))
        return out

    def _phrase_hits(self, ph: Phrase, docs: list[OracleDoc]) -> dict[int, float]:
        n, avgdl = self._field_stats(ph.field)
        if n == 0:
            return {}
        dfs = [self._df(ph.field, t) for t in ph.terms]
        if any(df == 0 for df in dfs):
            return {}
        idf_sum = sum(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) for df in dfs)
        base = ph.offsets[0]
        out = {}
        for d in docs:
            toks = d.tokens.get(ph.field)
            if not toks:
                continue
            posmap = defaultdict(set)
            for t, p in toks:
                posmap[t].add(p)
            # anchor-displacement form (query/plan.py Phrase): with slop=0
            # every surviving anchor has displacement 0 and weight 1, i.e.
            # the exact-phrase tf
            slop = getattr(ph, "slop", 0)
            tf = 0.0
            for p0 in posmap.get(ph.terms[0], ()):
                disp = 0.0
                for t, off in zip(ph.terms[1:], ph.offsets[1:]):
                    ps = posmap.get(t)
                    if not ps:
                        disp = math.inf
                        break
                    disp += min(abs(p - (p0 + off - base)) for p in ps)
                if disp <= slop:
                    tf += 1.0 / (1.0 + disp)
            if tf:
                dl = float(len(toks))
                out[d.doc_id] = idf_sum * (tf * (bm25.K1 + 1)
                                           / (tf + bm25.K1 * (1 - bm25.B + bm25.B * dl / avgdl)))
        return out

    # ------------------------------------------------------------ bulk load
    @classmethod
    def from_rows(cls, rows, analyzer: str = "standard") -> "OracleEngine":
        """rows: iterable of dicts with repo/path/content (+ optional fields
        map).  doc_ids assigned exactly like the engine: dense, ordered by
        (repo, path)."""
        eng = cls(analyzer=analyzer)
        rows = sorted(rows, key=lambda r: (r["repo"], r["path"]))
        for i, r in enumerate(rows):
            fields = {"text": r["content"]}
            for k, v in (r.get("fields") or {}).items():
                fields[k] = v
            eng.index_doc(r["repo"], r["path"], fields, doc_id=i)
        return eng
