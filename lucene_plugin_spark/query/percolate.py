"""Percolator: reverse search — a registry of queries matched against a
document stream (Lucene's lucene-monitor / ES percolator).

``percolate(spark, queries, docs)`` returns (doc id, query_id) pairs: for
every incoming document, which registered queries match it.  The classic
deployment is alerting / routing over a feed — queries are the stored side,
documents stream through.

Scale shape: the query registry is broadcast (registries are 10^2-10^6
queries — KBs to MBs; always the broadcast side) and evaluation is
embarrassingly parallel per partition: no shuffle, no index, no state.
Inside each Arrow batch the evaluator is vectorized — one
``tokenize_codes`` pass (Arrow C++ kernels) then numpy set algebra per
query node: a Term is a membership test against the batch's (row, term)
pairs, a Phrase intersects (row, pos-offset)-encoded int64 arrays, Bool
combines row-id sets, and multi-term leaves (Range/Wildcard/Fuzzy) run
``exp_mask`` over the batch's distinct terms (vocab-sized, not
token-sized).  No per-token Python anywhere.

Match semantics mirror the engine's recursive BooleanWeight evaluation
(oracle.py `_eval_node`, scores ignored): every MUST/FILTER child matches,
no MUST_NOT child matches, #matching SHOULD >= max(minimumNumberShouldMatch,
1 if no MUST/FILTER else 0).  Sloppy phrases use the engine's
anchor-displacement rule.  Reference: the plugin has no percolator; this
extends the engine like ops/curation.py (brief's custom-operator clause).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from lucene_plugin_spark.analysis.tokenizer import tokenize_series
from lucene_plugin_spark.query.expand import EXPANDABLE, exp_mask
from lucene_plugin_spark.query.parser import parse_query
from lucene_plugin_spark.query.plan import (Bool, DisMax, MatchAll, Node,
                                            Phrase, SynSet, Term)

#: encode (row, pos) into one int64 so phrase alignment is np.intersect1d
_POS_BITS = 24  # positions < 16M per doc — beyond any real document


def _match_rows(node: Node, ctx) -> np.ndarray:
    """Sorted unique row ids (within the batch) matching ``node``."""
    toks, n_rows = ctx["toks"], ctx["n_rows"]
    if isinstance(node, MatchAll):
        return np.arange(n_rows, dtype=np.int64)
    if isinstance(node, Term):
        if node.field != ctx["field"]:
            return np.empty(0, np.int64)
        hit = toks[toks["term"] == node.term]
        return np.unique(hit["row"].to_numpy(dtype=np.int64))
    if isinstance(node, SynSet):
        if node.field != ctx["field"]:
            return np.empty(0, np.int64)
        hit = toks[toks["term"].isin(list(node.terms))]
        return np.unique(hit["row"].to_numpy(dtype=np.int64))
    if isinstance(node, EXPANDABLE):
        vocab = ctx["vocab"]
        m = exp_mask(node, ctx["vocab_fields"], vocab)
        terms = vocab[m]
        if not len(terms):
            return np.empty(0, np.int64)
        hit = toks[toks["term"].isin(set(terms))]
        return np.unique(hit["row"].to_numpy(dtype=np.int64))
    if isinstance(node, Phrase):
        if node.field != ctx["field"]:
            return np.empty(0, np.int64)
        base = node.offsets[0]
        if node.slop == 0:
            cur = None
            for t, off in zip(node.terms, node.offsets):
                part = toks[toks["term"] == t]
                rr = part["row"].to_numpy(dtype=np.int64)
                pp = part["pos"].to_numpy(dtype=np.int64) - (off - base)
                ok = pp >= 0  # a shifted-negative pos can never anchor
                enc = (rr[ok] << _POS_BITS) + pp[ok]
                cur = enc if cur is None else np.intersect1d(cur, enc)
                if cur.size == 0:
                    return np.empty(0, np.int64)
            return np.unique(cur >> _POS_BITS)
        # sloppy: anchor-displacement over the anchor term's occurrences
        out = []
        anchor = toks[toks["term"] == node.terms[0]]
        cand_rows = np.unique(anchor["row"].to_numpy(dtype=np.int64))
        by_term = {t: toks[toks["term"] == t] for t in set(node.terms)}
        for r in cand_rows:
            pos_of = {t: g[g["row"] == r]["pos"].to_numpy(dtype=np.int64)
                      for t, g in by_term.items()}
            if any(p.size == 0 for p in pos_of.values()):
                continue
            a = pos_of[node.terms[0]]
            disp = np.zeros(a.shape, dtype=np.float64)
            for t, off in zip(node.terms[1:], node.offsets[1:]):
                q = pos_of[t]
                want = a + (off - base)
                j = np.clip(np.searchsorted(q, want), 0, q.size - 1)
                j0 = np.clip(j - 1, 0, q.size - 1)
                disp += np.minimum(np.abs(q[j] - want), np.abs(q[j0] - want))
            if (disp <= node.slop).any():
                out.append(r)
        return np.asarray(out, dtype=np.int64)
    if isinstance(node, DisMax):
        parts = [_match_rows(c, ctx) for c in node.disjuncts]
        return np.unique(np.concatenate(parts)) if parts else \
            np.empty(0, np.int64)
    if isinstance(node, Bool):
        req = [_match_rows(c, ctx) for c in list(node.must) + list(node.filter)]
        sh = [_match_rows(c, ctx) for c in node.should]
        cur = None
        for r_ in req:
            cur = r_ if cur is None else np.intersect1d(cur, r_)
            if cur.size == 0:
                return cur
        mm = max(node.min_should, 0 if req else (1 if sh else 0))
        if mm > 0 and not sh:
            return np.empty(0, np.int64)  # mm demands SHOULDs that don't exist
        if sh:
            allsh = np.concatenate(sh) if sh else np.empty(0, np.int64)
            rows_s, counts = np.unique(allsh, return_counts=True)
            ok = rows_s[counts >= max(mm, 1)] if mm > 0 else rows_s
            if mm > 0:
                cur = ok if cur is None else np.intersect1d(cur, ok)
            elif cur is None:
                cur = rows_s
        if cur is None:
            cur = np.empty(0, np.int64)
        for c in node.must_not:
            neg = _match_rows(c, ctx)
            if neg.size:
                cur = np.setdiff1d(cur, neg, assume_unique=True)
        return cur
    raise TypeError(f"unsupported percolator node {type(node).__name__}")


def _can_match(node: Node, vocab: set, field: str) -> bool:
    """Registry prefilter (lucene-monitor's query-index idea, reduced to a
    per-batch vocabulary test): False ONLY when ``node`` provably matches
    nothing whose terms come from ``vocab`` — a Term/Phrase needs its
    term(s) present, a Bool needs every MUST/FILTER child viable plus
    enough viable SHOULD children for its effective
    minimumNumberShouldMatch.  Conservative everywhere else (expandable
    leaves return True; MUST_NOT can only shrink a match set).  At
    10^5-10^6 registered queries this skips the vectorized evaluation for
    the vast majority whose required terms are absent from the batch."""
    if isinstance(node, MatchAll):
        return True
    if isinstance(node, Term):
        return node.field == field and node.term in vocab
    if isinstance(node, SynSet):
        return node.field == field and any(t in vocab for t in node.terms)
    if isinstance(node, EXPANDABLE):
        return True  # needs exp_mask over the vocab; evaluate for real
    if isinstance(node, Phrase):
        return node.field == field and all(t in vocab for t in node.terms)
    if isinstance(node, DisMax):
        return any(_can_match(c, vocab, field) for c in node.disjuncts)
    if isinstance(node, Bool):
        if not all(_can_match(c, vocab, field)
                   for c in list(node.must) + list(node.filter)):
            return False
        req = list(node.must) + list(node.filter)
        mm = max(node.min_should, 0 if req else (1 if node.should else 0))
        if mm > 0:
            viable = sum(1 for c in node.should if _can_match(c, vocab, field))
            if viable < mm:
                return False
        return True
    return True  # unknown node kinds evaluate for real


def percolate(spark: SparkSession, queries: list[tuple[str, str]],
              docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", field: str = "text",
              variant: str = "standard") -> DataFrame:
    """(id, query_id) pairs: which registered queries match each document.

    ``queries``: [(query_id, classic query string), ...] — parsed once on
    the driver with the given analyzer ``variant`` and broadcast as plan
    nodes; documents are analyzed with the SAME variant inside the batch.
    Before evaluating a query against a batch, the ``_can_match``
    prefilter drops queries whose required terms are absent from the
    batch vocabulary — the lucene-monitor registry-pruning analogue that
    keeps per-batch cost proportional to the queries that COULD fire,
    not the registry size.
    """
    nodes = [(qid, parse_query(q, variant=variant)) for qid, q in queries]
    bc = spark.sparkContext.broadcast(nodes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = tokenize_series(pdf[text_col], variant=variant)
            vocab = pd.Series(toks["term"].unique())
            vocab_set = set(vocab)
            ctx = {"toks": toks, "n_rows": len(pdf), "vocab": vocab,
                   "field": field,
                   "vocab_fields": pd.Series([field] * len(vocab))}
            ids = pdf[id_col].to_numpy()
            out_ids, out_qids = [], []
            for qid, node in bc.value:
                if not _can_match(node, vocab_set, field):
                    continue  # provably zero matches in this batch
                rows = _match_rows(node, ctx)
                out_ids.append(ids[rows])
                out_qids.append(np.repeat(qid, rows.size))
            yield pd.DataFrame({
                id_col: np.concatenate(out_ids) if out_ids else ids[:0],
                "query_id": np.concatenate(out_qids) if out_qids
                else np.array([], dtype=object)})

    schema = f"{id_col} long, query_id string"
    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)
