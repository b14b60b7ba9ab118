"""Advanced scoring surfaces over a built index: two-phase rescoring,
constant-score, function-score (doc-value boosts), ClassicSimilarity
(TF-IDF) ranking and SpanFirst queries.

Lucene analogues (reference reaches all of these through the same
``IndexSearcher`` the plugin wraps, LuceneIndexBean.java:727-735):

- :func:`rescore`        -> ``QueryRescorer.rescore(searcher, topDocs, q, w, n)``
- :func:`constant_score` -> ``ConstantScoreQuery(q)`` (boost per match)
- :func:`function_score` -> ``FunctionScoreQuery`` (boost by doc value)
- :func:`tfidf_search`   -> ``ClassicSimilarity`` ranking (Lucene <=5 default)
- :func:`span_first`     -> ``SpanFirstQuery(SpanTermQuery(t), end)``
- :func:`span_position_range` -> ``SpanPositionRangeQuery(span, start, end)``
- :func:`span_or`        -> ``SpanOrQuery(SpanTermQuery(t), ...)``
- :func:`span_not`       -> ``SpanNotQuery(include, exclude, pre, post)``
- :func:`span_containing`-> ``SpanContainingQuery(big, little)``
- :func:`span_within`    -> ``SpanWithinQuery(big, little)``
- :func:`lm_dirichlet_search` -> ``LMDirichletSimilarity(mu)`` top-k
- :func:`lm_jm_search`   -> ``LMJelinekMercerSimilarity(lambda)`` top-k
- :func:`dfr_search`     -> ``DFRSimilarity(In, L, H2(c))`` top-k
- :func:`ib_search`      -> ``IBSimilarity(LL, DF, H2(c))`` top-k
- :func:`explain_scores` -> ``IndexSearcher.explain(query, doc)`` rows
- :func:`multi_field`    -> ``MultiFieldQueryParser(fields, analyzer, boosts)``
- :func:`phrase_prefix`  -> phrase ending in ``app*`` (MultiPhraseQuery javadoc)
- :func:`common_terms`   -> ``CommonTermsQuery`` (lucene-queries module)
- :func:`federated_search`-> ``MultiReader``-style fan-out, per-index stats

Module-level functions over a :class:`SearchEngine` (the pattern of
``query/results.py``): the engine carries the catalog, snapshot pins and
analyzer; these compose its primitives declaratively so Catalyst keeps
owning the physical plan.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

import numpy as np

from lucene_plugin_spark.index.builder import flat_postings_view
from lucene_plugin_spark.query.parser import parse_query

#: "everything" limit for paths that legitimately need the full match set
#: (Lucene's field/function collectors also visit every hit)
_ALL = (1 << 31) - 1  # Integer.MAX_VALUE: .limit() takes a Java int




def _driver_live_mask(engine, ids: np.ndarray, slices, repo) -> np.ndarray:
    """liveDocs + collection-range mask for a driver-path id vector (the
    same tombstone/range logic as SearchEngine._search_driver)."""
    from lucene_plugin_spark.query.executor import _read_tombstones
    mask = np.ones(ids.shape, dtype=bool)
    _, tomb_dirs = engine._sidecar_dirs()
    if tomb_dirs:
        parts = [_read_tombstones(tomb_dirs, d) for d in slices]
        dead = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        if dead.size:
            pos = np.searchsorted(dead, ids)
            pos[pos == dead.size] = 0
            mask &= dead[pos] != ids
    if repo is not None:
        rmask = np.zeros(ids.shape, dtype=bool)
        for lo, hi in engine.repo_doc_ranges(repo):
            rmask |= (ids >= lo) & (ids <= hi)
        mask &= rmask
    return mask


def _driver_topk_df(engine, ids: np.ndarray, scores: np.ndarray, limit: int):
    """(score desc, doc_id asc) top-k -> DataFrame(doc_id, path, score) via
    the warmed path map (zero jobs)."""
    order = np.lexsort((ids, -scores))[:limit]
    pm = engine._path_map
    import pandas as pd
    res = pd.DataFrame({"doc_id": ids[order],
                        "path": [pm.get(int(d)) for d in ids[order]],
                        "score": scores[order]})
    return engine.spark.createDataFrame(
        res, "doc_id long, path string, score double")


def rescore(engine, repo: str | None, query: str, rescore_query: str,
            window: int = 50, weight: float = 2.0, limit: int = 10) -> DataFrame:
    """Two-phase ranking (Lucene ``QueryRescorer`` / ES ``rescore``):
    rank by ``query``; the top ``window`` docs are re-scored as
    ``base + weight * secondary`` where ``secondary`` is the doc's score
    under ``rescore_query`` (0 when it doesn't match) and re-sorted among
    themselves; docs OUTSIDE the window keep their base scores and base
    order AFTER the rescored block (they can never re-enter it) — exactly
    Lucene ``QueryRescorer.rescore`` when ``limit > window``.  ``weight``
    must be >= 0: the window-only cut assumes rescoring never demotes a
    window doc below the tail, which a negative weight would break.

    Scale shape: the window is k-row and broadcast; the secondary query runs
    once through the ordinary engine (its own pruned top-k machinery).  Use
    a selective secondary (phrase / strict AND — the standard proximity
    rescore) so its match set, not the corpus, bounds the extra cost.
    """
    if weight < 0:
        raise ValueError(f"rescore weight must be >= 0, got {weight}")
    from pyspark.sql import Window
    base = engine.search(repo, query, limit=max(window, limit))
    rnode = parse_query(rescore_query, variant=engine.analyzer)
    sec = (engine.search_node(rnode, repo, limit=_ALL)
           .select("doc_id", F.col("score").alias("_sec")))
    rank = F.row_number().over(
        Window.orderBy(F.desc("score"), F.asc("doc_id")))
    combined = (F.col("score") + F.lit(float(weight))
                * F.coalesce(F.col("_sec"), F.lit(0.0)))
    scored = (base.withColumn("_rank", rank)
              .join(sec, "doc_id", "left")
              .select("doc_id", "path", "_rank",
                      F.when(F.col("_rank") <= window, combined)
                      .otherwise(F.col("score")).alias("score")))
    # rescored block first (combined desc, docID asc), base tail after it in
    # unchanged base order; one k-row window sort, never corpus-sized
    in_tail = (F.col("_rank") > window).cast("int")
    sort2 = F.when(F.col("_rank") <= window, -F.col("score")) \
             .otherwise(F.col("_rank").cast("double"))
    return (scored
            .orderBy(F.asc(in_tail), F.asc(sort2), F.asc("doc_id"))
            .limit(limit)
            .select("doc_id", "path", "score"))


def constant_score(engine, repo: str | None, query: str, boost: float = 1.0,
                   limit: int = 255) -> DataFrame:
    """``ConstantScoreQuery``: every match scores exactly ``boost``; ranking
    degenerates to docID order (Lucene's tie-break), so the top-k cut is the
    first ``limit`` matching docIDs.  The match set is computed by the
    ordinary engine; scoring work is skipped conceptually (scores are
    overwritten), which is honest to Lucene — its ConstantScoreWeight still
    iterates the same postings, it just doesn't read norms."""
    node = parse_query(query, variant=engine.analyzer)
    hits = engine.search_node(node, repo, limit=_ALL)
    return (hits.select("doc_id", "path",
                        F.lit(float(boost)).alias("score"))
            .orderBy(F.asc("doc_id")).limit(limit))


#: term-count threshold where a literal ``term IN (...)`` predicate stops
#: being the right pushdown vehicle and the term set becomes a broadcast
#: relation instead (Catalyst converts large IN lists poorly and the plan
#: string itself grows linearly)
_TERMS_SET_LITERAL_MAX = 1024


def terms_set_query(engine, repo: str | None, terms: list[str],
                    field: str = "text", boost: float = 1.0,
                    limit: int = 255) -> DataFrame:
    """``TermsQuery`` (lucene-queries 5.2): matches docs containing ANY of
    the given terms, as a CONSTANT-SCORE filter — built for term sets far
    beyond ``BooleanQuery.maxClauseCount`` (e.g. thousands of ids), where
    Lucene skips per-term scorers entirely and unions sorted postings into
    a bitset; every match scores ``boost`` and ranking degenerates to docID
    order (the ConstantScore tie-break, same as :func:`constant_score`).

    Scale shape: ≤{lit} terms ride a literal ``term IN (...)`` predicate
    pushed into the term-sorted pruned segments scan (O(matching blocks)
    decode); larger sets become a BROADCAST semi-join against the postings
    scan — the term relation is query-sized, never the corpus, so the
    corpus side still streams map-only with no shuffle.  The distinct-doc
    union is one map-side-combined aggregate.
    """
    toks = sorted({t.lower() for t in terms if t})
    if not toks:
        return engine.spark.createDataFrame(
            [], "doc_id long, path string, score double")
    pairs = [(field, t) for t in toks]
    dfm = engine._df_for_pairs(pairs)
    if (engine._path_map is not None
            and 0 < sum(dfm.values()) <= engine.driver_exec_max_postings):
        # driver fast path (same block cache as term queries): union the
        # decoded docID vectors, constant score, docID-order cut — zero
        # scoring arithmetic, like Lucene's bitset union
        present = [(field, t) for t in toks if dfm.get((field, t))]
        idx, slices = engine._blocks_for(present)
        parts = []
        for f, t in present:
            ids, _tfs, _ = idx.decoded(f, t, False)
            if ids.size:
                parts.append(ids)
        if not parts:
            return engine.spark.createDataFrame(
                [], "doc_id long, path string, score double")
        ids = np.unique(np.concatenate(parts))
        ids = ids[_driver_live_mask(engine, ids, slices, repo)][:limit]
        return _driver_topk_df(engine, ids,
                               np.full(ids.shape, float(boost)), limit)
    if len(toks) <= _TERMS_SET_LITERAL_MAX:
        flat = (flat_postings_view(engine.spark, engine.catalog, terms=toks)
                .where(F.col("field") == field))
    else:
        flat = (flat_postings_view(engine.spark, engine.catalog)
                .where(F.col("field") == field))
        tdf = engine.spark.createDataFrame(
            [(t,) for t in toks], "term string")
        flat = flat.join(F.broadcast(tdf), "term", "left_semi")
    matches = flat.select("doc_id").distinct() \
        .withColumn("score", F.lit(float(boost)))
    matches = engine._finalize_df_hits(matches, repo)
    meta = engine._meta_path_df()
    topk = matches.orderBy(F.asc("doc_id")).limit(limit)
    return (meta.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "path",
                    F.lit(float(boost)).alias("score"))
            .orderBy(F.asc("doc_id")))


terms_set_query.__doc__ = terms_set_query.__doc__.format(
    lit=_TERMS_SET_LITERAL_MAX)


def function_score(engine, repo: str | None, query: str, field: str = "text",
                   weight: float = 0.1, limit: int = 10) -> DataFrame:
    """``FunctionScoreQuery``: final = bm25 * (1 + weight * ln(1 + dl)) —
    a document-value boost from the index's own norms (field length), the
    docvalue every Lucene function query can reach without stored fields.

    Needs the FULL match set (a boost can promote any match into the top-k;
    Lucene's function collector visits every hit too).  The doc-length side
    is the skinny ``field_lens`` table — (doc_id, dl) longs, never content —
    and the join is doc_id equi-join, AQE-broadcastable when the match set
    is small."""
    node = parse_query(query, variant=engine.analyzer)
    hits = engine.search_node(node, repo, limit=_ALL)
    lens = (engine._tbl("field_lens")
            .where(F.col("field") == field).select("doc_id", "dl"))
    boost = 1.0 + F.lit(float(weight)) * F.log(F.lit(1.0) + F.col("dl"))
    return (hits.join(lens, "doc_id")
            .select("doc_id", "path", (F.col("score") * boost).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(limit))


def tfidf_search(engine, repo: str | None, terms: list[str],
                 field: str = "text", limit: int = 10) -> DataFrame:
    """Top-k under Lucene ``ClassicSimilarity`` (the TF-IDF the reference's
    Lucene 5.2.1 actually defaulted to — LuceneIndexBean.java:664-691 never
    calls setSimilarity; our BM25 default follows the north rule, this is
    the fidelity mode):

    ``score(d) = Σ_t sqrt(tf) * (1 + ln(N / (df + 1)))² * (1 / sqrt(dl))``

    (query-norm omitted: it is rank-neutral).  Same declarative shape as the
    BM25 DataFrame strategy — postings derived from the segments scan with
    the term predicate pushed to the term-sorted parquet row groups, stats
    broadcast, arithmetic in whole-stage codegen."""
    ts = sorted({t.lower() for t in terms})
    pairs = [(field, t) for t in ts]
    dfm = engine._df_for_pairs(pairs)
    n_docs0, _a = engine._field_stats().get(field, (0.0, 1.0))
    if (engine._path_map is not None
            and sum(dfm.values()) <= engine.driver_exec_max_postings):
        # driver fast path: postings through the resident block cache (the
        # same cache plain term queries ride), ClassicSimilarity in numpy
        idx, slices = engine._blocks_for(pairs)
        norms_dirs, _td = engine._sidecar_dirs()
        norm_lookup = engine._norm_lookup_for(tuple(slices), (field,),
                                              norms_dirs)
        id_parts, s_parts = [], []
        for t in ts:
            ids, tfs, _ = idx.decoded(field, t, False)
            if not ids.size:
                continue
            nd, dls = norm_lookup[field]
            dl = dls[np.searchsorted(nd, ids)]
            idf_t = 1.0 + np.log(n_docs0 / (dfm.get((field, t), 0.0) + 1.0))
            id_parts.append(ids)
            s_parts.append(np.sqrt(tfs.astype(np.float64)) * idf_t * idf_t
                           / np.sqrt(dl.astype(np.float64)))
        if not id_parts:
            return engine.spark.createDataFrame(
                [], "doc_id long, path string, score double")
        all_ids = np.concatenate(id_parts)
        all_s = np.concatenate(s_parts)
        uids, inv = np.unique(all_ids, return_inverse=True)
        agg = np.zeros(uids.shape, dtype=np.float64)
        np.add.at(agg, inv, all_s)
        live = _driver_live_mask(engine, uids, slices, repo)
        return _driver_topk_df(engine, uids[live], agg[live], limit)
    flat = (flat_postings_view(engine.spark, engine.catalog, terms=ts)
            .where(F.col("field") == field))
    td = (engine._tbl("term_dict")
          .where((F.col("field") == field) & F.col("term").isin(ts))
          .select("term", "df"))
    n_docs, _avgdl = engine._field_stats().get(field, (0.0, 1.0))
    if n_docs == 0.0:
        return engine.spark.createDataFrame(
            [], "doc_id long, path string, score double")
    idf = F.lit(1.0) + F.log(F.lit(float(n_docs)) / (F.col("df") + 1.0))
    per_term = (F.sqrt(F.col("tf").cast("double")) * idf * idf
                / F.sqrt(F.col("dl").cast("double")))
    agg = (flat.join(F.broadcast(td), "term")
           .select("doc_id", per_term.alias("s"))
           .groupBy("doc_id").agg(F.sum("s").alias("score")))
    agg = engine._finalize_df_hits(agg, repo)
    meta = engine._meta_path_df()
    topk = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
    return (meta.join(F.broadcast(topk), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .select("doc_id", "path", "score"))


def sweetspot_search(engine, repo: str | None, terms: list[str],
                     field: str = "text", ln_min: int = 8, ln_max: int = 32,
                     steepness: float = 0.5, limit: int = 10) -> DataFrame:
    """Top-k under ``SweetSpotSimilarity`` (lucene-misc 5.2 — the tunable
    ClassicSimilarity whose length norm is a PLATEAU instead of 1/sqrt(dl):
    docs whose field length falls in the sweet spot ``[ln_min, ln_max]``
    get norm 1.0, lengths outside decay as

        1 / sqrt(steepness * (|dl-min| + |dl-max| - (max-min)) + 1)

    — ``computeLengthNorm``; tf/idf keep the classic shape, so the score
    is ``Σ_t sqrt(tf) * (1 + ln(N/(df+1)))² * plateau(dl)``.  The
    baseline-tf hyperbola is left at its identity defaults, like Lucene's.

    Two-path shape identical to :func:`tfidf_search`: resident driver
    block cache when predicted postings are small, else the term-pruned
    postings scan with broadcast stats and codegen arithmetic.
    """
    if not (0 < ln_min <= ln_max):
        raise ValueError(f"need 0 < ln_min <= ln_max, got [{ln_min},"
                         f" {ln_max}]")
    if steepness < 0:
        raise ValueError(f"steepness must be >= 0, got {steepness}")
    ts = sorted({t.lower() for t in terms})
    pairs = [(field, t) for t in ts]
    dfm = engine._df_for_pairs(pairs)
    n_docs0, _a = engine._field_stats().get(field, (0.0, 1.0))
    lo, hi, s = float(ln_min), float(ln_max), float(steepness)
    if (engine._path_map is not None
            and sum(dfm.values()) <= engine.driver_exec_max_postings):
        idx, slices = engine._blocks_for(pairs)
        norms_dirs, _td = engine._sidecar_dirs()
        norm_lookup = engine._norm_lookup_for(tuple(slices), (field,),
                                              norms_dirs)
        id_parts, s_parts = [], []
        for t in ts:
            ids, tfs, _ = idx.decoded(field, t, False)
            if not ids.size:
                continue
            nd, dls = norm_lookup[field]
            dl = dls[np.searchsorted(nd, ids)].astype(np.float64)
            norm = 1.0 / np.sqrt(
                s * (np.abs(dl - lo) + np.abs(dl - hi) - (hi - lo)) + 1.0)
            idf_t = 1.0 + np.log(n_docs0 / (dfm.get((field, t), 0.0) + 1.0))
            id_parts.append(ids)
            s_parts.append(np.sqrt(tfs.astype(np.float64))
                           * idf_t * idf_t * norm)
        if not id_parts:
            return engine.spark.createDataFrame(
                [], "doc_id long, path string, score double")
        all_ids = np.concatenate(id_parts)
        all_s = np.concatenate(s_parts)
        uids, inv = np.unique(all_ids, return_inverse=True)
        agg = np.zeros(uids.shape, dtype=np.float64)
        np.add.at(agg, inv, all_s)
        live = _driver_live_mask(engine, uids, slices, repo)
        return _driver_topk_df(engine, uids[live], agg[live], limit)
    flat = (flat_postings_view(engine.spark, engine.catalog, terms=ts)
            .where(F.col("field") == field))
    td = (engine._tbl("term_dict")
          .where((F.col("field") == field) & F.col("term").isin(ts))
          .select("term", "df"))
    n_docs, _avgdl = engine._field_stats().get(field, (0.0, 1.0))
    if n_docs == 0.0:
        return engine.spark.createDataFrame(
            [], "doc_id long, path string, score double")
    dl = F.col("dl").cast("double")
    norm = 1.0 / F.sqrt(F.lit(s) * (F.abs(dl - lo) + F.abs(dl - hi)
                                    - (hi - lo)) + 1.0)
    idf = F.lit(1.0) + F.log(F.lit(float(n_docs)) / (F.col("df") + 1.0))
    per_term = F.sqrt(F.col("tf").cast("double")) * idf * idf * norm
    agg = (flat.join(F.broadcast(td), "term")
           .select("doc_id", per_term.alias("s"))
           .groupBy("doc_id").agg(F.sum("s").alias("score")))
    agg = engine._finalize_df_hits(agg, repo)
    meta = engine._meta_path_df()
    topk = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
    return (meta.join(F.broadcast(topk), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .select("doc_id", "path", "score"))


def _lm_search(engine, repo: str | None, terms: list[str], field: str,
               limit: int, kind: str, mu: float, lam: float) -> DataFrame:
    """Shared core of :func:`lm_dirichlet_search` / :func:`lm_jm_search`
    (lucene-core 5.2 ``LMDirichletSimilarity`` / ``LMJelinekMercerSimilarity``
    — selectable on the same IndexSearcher the reference holds,
    LuceneIndexBean.java:664-691).

    Both language models score against the collection probability
    ``p(t|C) = (totalTermFreq + 1) / (numberOfFieldTokens + 1)``
    (``LMSimilarity.fillBasicStats``), then per matching (doc, term):

    - dirichlet: ``max(0, ln(1 + tf / (mu * p)) + ln(mu / (dl + mu)))``
      (the per-term clamp is Lucene's ``score > 0 ? score : 0``)
    - jelinek-mercer: ``ln(1 + ((1 - λ) * tf / dl) / (λ * p))``

    summed over the query terms.  Scale shape: identical to
    :func:`tfidf_search`'s DataFrame strategy — the term predicate is pushed
    into the term-sorted segments scan, the per-term collection stats ride a
    broadcast (terms are query-sized), the arithmetic is whole-stage codegen,
    and the only shuffle is the doc_id partial-aggregated groupBy.  The
    collection token count comes from the delta-maintained ``stats.sum_dl``
    (one cached tiny-table read), never a corpus scan.
    """
    ts = sorted({t.lower() for t in terms})
    pairs = [(field, t) for t in ts]
    dfm = engine._df_for_pairs(pairs)  # also fills the cf cache
    n_docs, _avgdl = engine._field_stats().get(field, (0.0, 1.0))
    empty = "doc_id long, path string, score double"
    if n_docs == 0.0 or all(dfm.get(p, 0.0) == 0.0 for p in pairs):
        return engine.spark.createDataFrame([], empty)
    sum_dl = engine._field_sum_dl(field)
    probs = [(t, (engine._cf_cache.get((field, t), 0.0) + 1.0)
              / (sum_dl + 1.0)) for t in ts]
    if (engine._path_map is not None
            and sum(dfm.values()) <= engine.driver_exec_max_postings):
        # driver fast path: postings through the resident block cache (the
        # same cache the term/TF-IDF paths ride), LM arithmetic in numpy —
        # result-identical to the distributed path (pytest-checked)
        p_by_term = dict(probs)
        idx, slices = engine._blocks_for(pairs)
        norms_dirs, _td = engine._sidecar_dirs()
        norm_lookup = engine._norm_lookup_for(tuple(slices), (field,),
                                              norms_dirs)
        id_parts, s_parts = [], []
        for t in ts:
            ids, tfs, _ = idx.decoded(field, t, False)
            if not ids.size:
                continue
            nd, dls = norm_lookup[field]
            dl = dls[np.searchsorted(nd, ids)].astype(np.float64)
            tfv = tfs.astype(np.float64)
            p = p_by_term[t]
            if kind == "dirichlet":
                sv = np.log(1.0 + tfv / (mu * p)) + np.log(mu / (dl + mu))
                np.maximum(sv, 0.0, out=sv)
            else:
                sv = np.log1p(((1.0 - lam) * tfv / dl) / (lam * p))
            id_parts.append(ids)
            s_parts.append(sv)
        if not id_parts:
            return engine.spark.createDataFrame([], empty)
        all_ids = np.concatenate(id_parts)
        all_s = np.concatenate(s_parts)
        uids, inv = np.unique(all_ids, return_inverse=True)
        agg = np.zeros(uids.shape, dtype=np.float64)
        np.add.at(agg, inv, all_s)
        live = _driver_live_mask(engine, uids, slices, repo)
        return _driver_topk_df(engine, uids[live], agg[live], limit)
    pdf = engine.spark.createDataFrame(probs, "term string, p double")
    flat = (flat_postings_view(engine.spark, engine.catalog, terms=ts)
            .where(F.col("field") == field))
    j = flat.join(F.broadcast(pdf), "term")
    tfc = F.col("tf").cast("double")
    dlc = F.col("dl").cast("double")
    mu_l, lam_l = F.lit(float(mu)), F.lit(float(lam))
    if kind == "dirichlet":
        s = (F.log(F.lit(1.0) + tfc / (mu_l * F.col("p")))
             + F.log(mu_l / (dlc + mu_l)))
        s = F.greatest(s, F.lit(0.0))
    else:
        s = F.log(F.lit(1.0)
                  + ((F.lit(1.0) - lam_l) * tfc / dlc)
                  / (lam_l * F.col("p")))
    agg = (j.select("doc_id", s.alias("s"))
           .groupBy("doc_id").agg(F.sum("s").alias("score")))
    agg = engine._finalize_df_hits(agg, repo)
    meta = engine._meta_path_df()
    topk = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
    return (meta.join(F.broadcast(topk), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .select("doc_id", "path", "score"))


def lm_dirichlet_search(engine, repo: str | None, terms: list[str],
                        field: str = "text", mu: float = 2000.0,
                        limit: int = 10) -> DataFrame:
    """Top-k under ``LMDirichletSimilarity(mu)`` (Lucene 5.2 default
    mu=2000).  Semantics/scale: :func:`_lm_search`."""
    return _lm_search(engine, repo, terms, field, limit, "dirichlet",
                      mu=mu, lam=0.1)


def lm_jm_search(engine, repo: str | None, terms: list[str],
                 field: str = "text", lam: float = 0.1,
                 limit: int = 10) -> DataFrame:
    """Top-k under ``LMJelinekMercerSimilarity(lambda)`` (Lucene 5.2's
    short-query default λ=0.1).  Semantics/scale: :func:`_lm_search`."""
    return _lm_search(engine, repo, terms, field, limit, "jm",
                      mu=2000.0, lam=lam)


def dfr_search(engine, repo: str | None, terms: list[str],
               field: str = "text", c: float = 1.0,
               limit: int = 10) -> DataFrame:
    """Top-k under the DFR ``I(n)L2`` model (Amati & van Rijsbergen's
    divergence-from-randomness framework; Lucene 5.2 exposes it as
    ``DFRSimilarity(BasicModelIn, AfterEffectL, NormalizationH2(c))`` —
    selectable on the same IndexSearcher the reference holds,
    LuceneIndexBean.java:664-691).  Per matching (doc, term):

    - H2 normalization: ``tfn = tf * log2(1 + c * avgdl / dl)``
    - I(n) basic model with the L after-effect:
      ``score = (tfn / (1 + tfn)) * log2((N + 1) / (df + 0.5))``

    summed over the query terms.  Same two-path shape as
    :func:`tfidf_search` / :func:`_lm_search`: warmed engines score the
    postings through the resident driver block cache in numpy
    (path-identical, pytest-checked); otherwise the term-pruned
    flat-postings scan with broadcast per-term stats, arithmetic in
    whole-stage codegen, one map-side-combined groupBy(doc_id)."""
    ts = sorted({t.lower() for t in terms})
    pairs = [(field, t) for t in ts]
    dfm = engine._df_for_pairs(pairs)
    n_docs, avgdl = engine._field_stats().get(field, (0.0, 1.0))
    empty = "doc_id long, path string, score double"
    if n_docs == 0.0 or all(dfm.get(p, 0.0) == 0.0 for p in pairs):
        return engine.spark.createDataFrame([], empty)
    LOG2 = math.log(2.0)
    idf2 = {t: math.log((n_docs + 1.0) / (dfm.get((field, t), 0.0) + 0.5))
            / LOG2 for t in ts}
    if (engine._path_map is not None
            and sum(dfm.values()) <= engine.driver_exec_max_postings):
        idx, slices = engine._blocks_for(pairs)
        norms_dirs, _td = engine._sidecar_dirs()
        norm_lookup = engine._norm_lookup_for(tuple(slices), (field,),
                                              norms_dirs)
        id_parts, s_parts = [], []
        for t in ts:
            ids, tfs, _ = idx.decoded(field, t, False)
            if not ids.size:
                continue
            nd, dls = norm_lookup[field]
            dl = dls[np.searchsorted(nd, ids)].astype(np.float64)
            tfn = tfs.astype(np.float64) * np.log2(1.0 + c * avgdl / dl)
            id_parts.append(ids)
            s_parts.append(tfn / (1.0 + tfn) * idf2[t])
        if not id_parts:
            return engine.spark.createDataFrame([], empty)
        all_ids = np.concatenate(id_parts)
        all_s = np.concatenate(s_parts)
        uids, inv = np.unique(all_ids, return_inverse=True)
        agg = np.zeros(uids.shape, dtype=np.float64)
        np.add.at(agg, inv, all_s)
        live = _driver_live_mask(engine, uids, slices, repo)
        return _driver_topk_df(engine, uids[live], agg[live], limit)
    sdf = engine.spark.createDataFrame(
        [(t, idf2[t]) for t in ts], "term string, idf2 double")
    flat = (flat_postings_view(engine.spark, engine.catalog, terms=ts)
            .where(F.col("field") == field))
    tfn = (F.col("tf").cast("double")
           * F.log2(F.lit(1.0) + F.lit(float(c * avgdl))
                    / F.col("dl").cast("double")))
    s = tfn / (F.lit(1.0) + tfn) * F.col("idf2")
    agg = (flat.join(F.broadcast(sdf), "term")
           .select("doc_id", s.alias("s"))
           .groupBy("doc_id").agg(F.sum("s").alias("score")))
    agg = engine._finalize_df_hits(agg, repo)
    meta = engine._meta_path_df()
    topk = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
    return (meta.join(F.broadcast(topk), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .select("doc_id", "path", "score"))


def ib_search(engine, repo: str | None, terms: list[str],
              field: str = "text", c: float = 1.0,
              limit: int = 10) -> DataFrame:
    """Top-k under the information-based ``IB LL-DF-H2`` model (Clinchant &
    Gaussier's information-based framework; Lucene 5.2 exposes it as
    ``IBSimilarity(DistributionLL, LambdaDF, NormalizationH2(c))`` —
    selectable on the same IndexSearcher the reference holds,
    LuceneIndexBean.java:664-691).  Per matching (doc, term):

    - H2 normalization: ``tfn = tf * log2(1 + c * avgdl / dl)``
    - log-logistic distribution with the document-frequency lambda
      ``λ = df / N``: ``score = ln((tfn + λ) / λ) = ln(1 + tfn/λ)``

    summed over the query terms.  Same two-path shape as
    :func:`dfr_search` (driver block-cache numpy fast path on warmed
    engines, else broadcast per-term stats onto the term-pruned postings
    scan; one map-side-combined groupBy)."""
    ts = sorted({t.lower() for t in terms})
    pairs = [(field, t) for t in ts]
    dfm = engine._df_for_pairs(pairs)
    n_docs, avgdl = engine._field_stats().get(field, (0.0, 1.0))
    empty = "doc_id long, path string, score double"
    if n_docs == 0.0 or all(dfm.get(p, 0.0) == 0.0 for p in pairs):
        return engine.spark.createDataFrame([], empty)
    lam = {t: max(dfm.get((field, t), 0.0), 0.5) / n_docs for t in ts}
    if (engine._path_map is not None
            and sum(dfm.values()) <= engine.driver_exec_max_postings):
        idx, slices = engine._blocks_for(pairs)
        norms_dirs, _td = engine._sidecar_dirs()
        norm_lookup = engine._norm_lookup_for(tuple(slices), (field,),
                                              norms_dirs)
        id_parts, s_parts = [], []
        for t in ts:
            ids, tfs, _ = idx.decoded(field, t, False)
            if not ids.size:
                continue
            nd, dls = norm_lookup[field]
            dl = dls[np.searchsorted(nd, ids)].astype(np.float64)
            tfn = tfs.astype(np.float64) * np.log2(1.0 + c * avgdl / dl)
            id_parts.append(ids)
            s_parts.append(np.log1p(tfn / lam[t]))
        if not id_parts:
            return engine.spark.createDataFrame([], empty)
        all_ids = np.concatenate(id_parts)
        all_s = np.concatenate(s_parts)
        uids, inv = np.unique(all_ids, return_inverse=True)
        agg = np.zeros(uids.shape, dtype=np.float64)
        np.add.at(agg, inv, all_s)
        live = _driver_live_mask(engine, uids, slices, repo)
        return _driver_topk_df(engine, uids[live], agg[live], limit)
    sdf = engine.spark.createDataFrame(
        [(t, lam[t]) for t in ts], "term string, lam double")
    flat = (flat_postings_view(engine.spark, engine.catalog, terms=ts)
            .where(F.col("field") == field))
    tfn = (F.col("tf").cast("double")
           * F.log2(F.lit(1.0) + F.lit(float(c * avgdl))
                    / F.col("dl").cast("double")))
    s = F.log(F.lit(1.0) + tfn / F.col("lam"))
    agg = (flat.join(F.broadcast(sdf), "term")
           .select("doc_id", s.alias("s"))
           .groupBy("doc_id").agg(F.sum("s").alias("score")))
    agg = engine._finalize_df_hits(agg, repo)
    meta = engine._meta_path_df()
    topk = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
    return (meta.join(F.broadcast(topk), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .select("doc_id", "path", "score"))


def span_position_range(engine, repo: str | None, term: str, start: int,
                        end: int, field: str = "text",
                        limit: int = 255) -> DataFrame:
    """``SpanPositionRangeQuery(SpanTermQuery(term), start, end)`` (lucene
    core 5.2 spans): docs where ``term`` occurs at a position ``p`` with
    ``start <= p`` and span end ``p+1 <= end`` — for one-position term
    spans that is ``start <= p < end`` (Lucene positions = post-stop
    ordinals with gaps, identical to ours).  ``SpanFirstQuery`` is the
    ``start=0`` special case and delegates here.  Scoring: BM25 over the
    WITHIN-RANGE occurrence count as tf — the span-scorer shape (freq =
    matching spans) with our BM25 similarity; idf uses the term's ordinary
    docFreq, exactly like Lucene's SpanWeight building termStates from the
    term itself.

    Declarative: positions come from the same pruned segments decode as a
    phrase; the position filter is a higher-order array function, no Python.
    """
    from lucene_plugin_spark.query import bm25
    if int(start) < 0:
        raise ValueError(f"start must be >= 0, got {start}")
    if int(end) <= int(start):
        # Lucene's SpanPositionRangeQuery with an empty window is
        # valid-and-empty, not an error (and SpanFirstQuery(end=0) relies
        # on it through the facade/HTTP surface)
        return engine.spark.createDataFrame(
            [], "doc_id long, path string, score double")
    start = int(start)
    t = term.lower()
    dfv0 = engine._df_for_pairs([(field, t)]).get((field, t), 0.0)
    if (engine._path_map is not None
            and dfv0 <= engine.driver_exec_max_postings):
        # driver fast path: one term's cached blocks, positions included
        stats = engine._field_stats()
        n_docs0, avgdl0 = stats.get(field, (0.0, 1.0))
        if n_docs0 == 0.0 or not dfv0:
            return engine.spark.createDataFrame(
                [], "doc_id long, path string, score double")
        idx, slices = engine._blocks_for([(field, t)],
                                         pos_pairs={(field, t)})
        ids, tfs, pos = idx.decoded(field, t, True)
        if not ids.size or pos is None:
            return engine.spark.createDataFrame(
                [], "doc_id long, path string, score double")
        ends = np.cumsum(tfs.astype(np.int64))
        starts = ends - tfs
        in_range = (pos >= start) & (pos < int(end))
        tf_first = np.add.reduceat(in_range.astype(np.int64), starts)
        # reduceat on an empty trailing segment repeats — tfs>0 always here
        keep = tf_first > 0
        ids_k, tff = ids[keep], tf_first[keep]
        norms_dirs, _td = engine._sidecar_dirs()
        nd, dls = engine._norm_lookup_for(tuple(slices), (field,),
                                          norms_dirs)[field]
        dl = dls[np.searchsorted(nd, ids_k)]
        sc = bm25.score(tff.astype(np.float64), dl.astype(np.float64),
                        float(dfv0), n_docs0, avgdl0)
        live = _driver_live_mask(engine, ids_k, slices, repo)
        return _driver_topk_df(engine, ids_k[live], sc[live], limit)
    flat = (flat_postings_view(engine.spark, engine.catalog, terms=[t])
            .where((F.col("field") == field) & (F.col("term") == t)))
    stats = engine._field_stats()
    n_docs, avgdl = stats.get(field, (0.0, 1.0))
    dfv = engine._df_for_pairs([(field, t)]).get((field, t), 0.0)
    if n_docs == 0.0 or not dfv:
        return engine.spark.createDataFrame(
            [], "doc_id long, path string, score double")
    tf_first = F.size(F.filter(
        "positions",
        lambda p: (p >= F.lit(start)) & (p < F.lit(int(end)))))
    idf = float(bm25.idf(float(dfv), n_docs))
    tfn = (tf_first.cast("double") * (bm25.K1 + 1.0)
           / (tf_first.cast("double")
              + bm25.K1 * (1.0 - bm25.B + bm25.B * F.col("dl") / F.lit(avgdl))))
    agg = (flat.where(tf_first > 0)
           .select("doc_id", (F.lit(idf) * tfn).alias("score"))
           .groupBy("doc_id").agg(F.sum("score").alias("score")))
    agg = engine._finalize_df_hits(agg, repo)
    meta = engine._meta_path_df()
    topk = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
    return (meta.join(F.broadcast(topk), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .select("doc_id", "path", "score"))


def span_first(engine, repo: str | None, term: str, end: int,
               field: str = "text", limit: int = 255) -> DataFrame:
    """``SpanFirstQuery(SpanTermQuery(term), end)``: Lucene defines it as
    ``SpanPositionRangeQuery`` with ``start=0`` — delegate accordingly."""
    return span_position_range(engine, repo, term, 0, end,
                               field=field, limit=limit)


def span_or(engine, repo: str | None, terms: list[str],
            field: str = "text", limit: int = 255) -> DataFrame:
    """``SpanOrQuery(SpanTermQuery(t), ...)``: a doc matches if ANY clause
    term occurs; the span scorer counts MATCHING SPANS as freq — for term
    spans that is ``Σ_t tf_t(d)`` — and runs ONE similarity built from ALL
    clause terms (Lucene ``SpanWeight.buildSimWeight`` feeds every term's
    statistics, so ``idf = Σ_t idf(t)``).  This is deliberately different
    from boolean OR, which scores each term separately against its own idf
    and sums the per-term scores: span-or blends the frequencies FIRST and
    saturates them through a single tf-norm.

    Scale shape: identical to the ordinary OR — driver fast path over the
    resident block cache when postings fit, else the flat-postings view with
    the term predicate pushed into the term-sorted parquet scan, one
    map-side-combined groupBy(doc_id), arithmetic in whole-stage codegen.
    """
    from lucene_plugin_spark.query import bm25
    empty = "doc_id long, path string, score double"
    ts = sorted({t.lower() for t in terms})
    pairs = [(field, t) for t in ts]
    dfm = engine._df_for_pairs(pairs)
    stats = engine._field_stats()
    n_docs, avgdl = stats.get(field, (0.0, 1.0))
    idf_sum = float(sum(bm25.idf(dfv, n_docs)
                        for dfv in dfm.values() if dfv > 0.0))
    if n_docs == 0.0 or idf_sum == 0.0:
        return engine.spark.createDataFrame([], empty)
    if (engine._path_map is not None
            and sum(dfm.values()) <= engine.driver_exec_max_postings):
        # driver fast path: per-term cached blocks, one freq accumulation
        idx, slices = engine._blocks_for(pairs)
        id_parts, tf_parts = [], []
        for t in ts:
            ids, tfs, _ = idx.decoded(field, t, False)
            if ids.size:
                id_parts.append(ids)
                tf_parts.append(tfs.astype(np.float64))
        if not id_parts:
            return engine.spark.createDataFrame([], empty)
        all_ids = np.concatenate(id_parts)
        all_tf = np.concatenate(tf_parts)
        uids, inv = np.unique(all_ids, return_inverse=True)
        freq = np.zeros(uids.shape, dtype=np.float64)
        np.add.at(freq, inv, all_tf)
        norms_dirs, _td = engine._sidecar_dirs()
        nd, dls = engine._norm_lookup_for(tuple(slices), (field,),
                                          norms_dirs)[field]
        dl = dls[np.searchsorted(nd, uids)].astype(np.float64)
        sc = idf_sum * bm25.tf_norm(freq, dl, avgdl)
        live = _driver_live_mask(engine, uids, slices, repo)
        return _driver_topk_df(engine, uids[live], sc[live], limit)
    flat = (flat_postings_view(engine.spark, engine.catalog, terms=ts)
            .where(F.col("field") == field))
    freq = (flat.groupBy("doc_id")
            .agg(F.sum(F.col("tf").cast("double")).alias("freq"),
                 F.max("dl").alias("dl")))
    tfn = (F.col("freq") * (bm25.K1 + 1.0)
           / (F.col("freq") + bm25.K1 * (1.0 - bm25.B
                                         + bm25.B * F.col("dl") / F.lit(avgdl))))
    agg = freq.select("doc_id", (F.lit(idf_sum) * tfn).alias("score"))
    agg = engine._finalize_df_hits(agg, repo)
    meta = engine._meta_path_df()
    topk = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
    return (meta.join(F.broadcast(topk), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .select("doc_id", "path", "score"))


def span_not(engine, repo: str | None, include: str, exclude: str,
             pre: int = 0, post: int = 0, field: str = "text",
             limit: int = 255) -> DataFrame:
    """``SpanNotQuery(SpanTermQuery(include), SpanTermQuery(exclude), pre,
    post)``: spans of ``include`` that have NO ``exclude`` occurrence within
    ``pre`` positions before or ``post`` after.  For term spans an include
    position ``p`` survives iff no exclude position ``q`` satisfies
    ``p - pre <= q <= p + post`` (``pre = post = 0`` -> same-position
    collision only, impossible for distinct single-token terms — callers
    pass the exclusion window they mean).  freq = surviving-span count,
    scored through BM25 with the INCLUDE term's ordinary docFreq (only
    include spans are scored; the exclusion is a positional filter).

    Scale shape: both posting lists arrive term-pruned from the segments
    scan; the exclusion is a left join on doc_id (docs without the exclude
    term skip the position filter entirely) and the per-position window
    test runs as nested higher-order array functions in the JVM — no
    shuffle beyond the doc_id join, no Python.
    """
    from lucene_plugin_spark.query import bm25
    empty = "doc_id long, path string, score double"
    inc, exc = include.lower(), exclude.lower()
    dfv = engine._df_for_pairs([(field, inc)]).get((field, inc), 0.0)
    stats = engine._field_stats()
    n_docs, avgdl = stats.get(field, (0.0, 1.0))
    if n_docs == 0.0 or not dfv:
        return engine.spark.createDataFrame([], empty)
    idf_inc = float(bm25.idf(float(dfv), n_docs))
    dfm2 = engine._df_for_pairs([(field, inc), (field, exc)])
    if (engine._path_map is not None
            and sum(dfm2.values()) <= engine.driver_exec_max_postings):
        # driver fast path: combined (docID, position) keys make the window
        # test two searchsorted probes over the exclude stream
        idx, slices = engine._blocks_for(
            [(field, inc), (field, exc)],
            pos_pairs={(field, inc), (field, exc)})
        ids_i, tfs_i, pos_i = idx.decoded(field, inc, True)
        if not ids_i.size or pos_i is None:
            return engine.spark.createDataFrame([], empty)
        ids_e, tfs_e, pos_e = idx.decoded(field, exc, True)
        if ids_e.size and pos_e is not None and pos_e.size:
            mx = int(max(pos_i.max() if pos_i.size else 0, pos_e.max()))
            m = mx + max(int(pre), int(post)) + 2
            ik = (np.repeat(ids_i, tfs_i).astype(np.int64) * m
                  + pos_i.astype(np.int64))
            ek = (np.repeat(ids_e, tfs_e).astype(np.int64) * m
                  + pos_e.astype(np.int64))
            ek.sort()
            lo = np.searchsorted(ek, ik - int(pre), side="left")
            hi = np.searchsorted(ek, ik + int(post), side="right")
            survive = (lo == hi).astype(np.int64)
        else:
            survive = np.ones(int(tfs_i.sum()), dtype=np.int64)
        ends = np.cumsum(tfs_i.astype(np.int64))
        tf_surv = np.add.reduceat(survive, ends - tfs_i)
        keep = tf_surv > 0
        ids_k, tfk = ids_i[keep], tf_surv[keep].astype(np.float64)
        if not ids_k.size:
            return engine.spark.createDataFrame([], empty)
        norms_dirs, _td = engine._sidecar_dirs()
        nd, dls = engine._norm_lookup_for(tuple(slices), (field,),
                                          norms_dirs)[field]
        dl = dls[np.searchsorted(nd, ids_k)].astype(np.float64)
        sc = idf_inc * bm25.tf_norm(tfk, dl, avgdl)
        live = _driver_live_mask(engine, ids_k, slices, repo)
        return _driver_topk_df(engine, ids_k[live], sc[live], limit)
    flat = (flat_postings_view(engine.spark, engine.catalog,
                               terms=sorted({inc, exc}))
            .where(F.col("field") == field))
    inc_df = (flat.where(F.col("term") == inc)
              .select("doc_id", "dl", F.col("positions").alias("ip")))
    exc_df = (flat.where(F.col("term") == exc)
              .select("doc_id", F.col("positions").alias("ep")))
    j = inc_df.join(exc_df, "doc_id", "left")
    pre_l, post_l = F.lit(int(pre)), F.lit(int(post))
    surv = F.when(F.col("ep").isNull(), F.size("ip")).otherwise(
        F.size(F.filter("ip", lambda p: ~F.exists(
            F.col("ep"), lambda q: (q >= p - pre_l) & (q <= p + post_l)))))
    tfc = surv.cast("double")
    tfn = (tfc * (bm25.K1 + 1.0)
           / (tfc + bm25.K1 * (1.0 - bm25.B
                               + bm25.B * F.col("dl") / F.lit(avgdl))))
    agg = (j.where(surv > 0)
           .select("doc_id", (F.lit(idf_inc) * tfn).alias("score")))
    agg = engine._finalize_df_hits(agg, repo)
    meta = engine._meta_path_df()
    topk = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
    return (meta.join(F.broadcast(topk), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .select("doc_id", "path", "score"))


def _span_contain(engine, repo: str | None, big: tuple[str, str],
                  little: str, slop: int, field: str, limit: int,
                  within: bool) -> DataFrame:
    """Shared core of :func:`span_containing` / :func:`span_within`
    (``SpanContainingQuery`` / ``SpanWithinQuery``, lucene-core 5.2:
    LuceneIndexBean.java:727-735 reaches them through the same searcher).

    ``big`` spans are the ordered pairs ``(pa, pb)`` of the two big terms
    with ``pa < pb`` and ``pb - pa - 1 <= slop`` — the all-pairs refinement
    of NearSpansOrdered's lazy enumeration, the same documented deviation as
    :meth:`SearchEngine.span_near`.  A ``little`` occurrence ``pc`` is
    contained when ``pa <= pc <= pb`` (span-interval containment
    ``[pc, pc+1) ⊆ [pa, pb+1)``; for distinct terms the endpoints can never
    collide, so this equals strict betweenness).

    - containing: freq = big spans holding >= 1 little occurrence
    - within:     freq = little occurrences inside >= 1 big span

    Lucene's ``SpanContainQuery.SpanContainWeight`` builds its similarity
    from BOTH clauses' term contexts, so ``idf = Σ idf(t)`` over all three
    terms, saturated through ONE tf-norm (the span-family blending rule
    :func:`span_or` documents).

    Scale shape: all three posting lists arrive term-pruned from the
    segments scan (``In(term, ...)`` pushed); the doc_id inner joins keep
    only docs holding all three terms BEFORE any position work; the span
    arithmetic is nested higher-order array functions in whole-stage
    codegen — no Python, no shuffle beyond the doc_id joins, and the final
    top-k is a broadcast path join.  Cost is O(the three terms' postings),
    independent of corpus size.
    """
    from lucene_plugin_spark.query import bm25
    empty = "doc_id long, path string, score double"
    a, b = big[0].lower(), big[1].lower()
    c = little.lower()
    dfm = engine._df_for_pairs([(field, a), (field, b), (field, c)])
    stats = engine._field_stats()
    n_docs, avgdl = stats.get(field, (0.0, 1.0))
    if n_docs == 0.0 or any(dfm.get((field, t), 0.0) == 0.0
                            for t in (a, b, c)):
        return engine.spark.createDataFrame([], empty)
    idf_sum = float(sum(bm25.idf(v, n_docs) for v in dfm.values()))
    flat = (flat_postings_view(engine.spark, engine.catalog,
                               terms=sorted({a, b, c}))
            .where(F.col("field") == field))
    a_df = (flat.where(F.col("term") == a)
            .select("doc_id", "dl", F.col("positions").alias("ap")))
    b_df = (flat.where(F.col("term") == b)
            .select("doc_id", F.col("positions").alias("bp")))
    c_df = (flat.where(F.col("term") == c)
            .select("doc_id", F.col("positions").alias("cp")))
    j = a_df.join(b_df, "doc_id").join(c_df, "doc_id")
    slop_l = F.lit(int(slop))
    if within:
        freq = F.size(F.filter("cp", lambda pc: F.exists(
            "ap", lambda pa: (pa <= pc) & F.exists(
                "bp", lambda pb: (pb >= pc) & (pb > pa)
                                 & (pb - pa - 1 <= slop_l)))))
    else:
        freq = F.aggregate(
            "ap", F.lit(0),
            lambda acc, pa: acc + F.size(F.filter(
                "bp", lambda pb: (pb > pa) & (pb - pa - 1 <= slop_l)
                                 & F.exists(
                    "cp", lambda pc: (pc >= pa) & (pc <= pb)))))
    tfc = freq.cast("double")
    tfn = (tfc * (bm25.K1 + 1.0)
           / (tfc + bm25.K1 * (1.0 - bm25.B
                               + bm25.B * F.col("dl") / F.lit(avgdl))))
    agg = (j.where(freq > 0)
           .select("doc_id", (F.lit(idf_sum) * tfn).alias("score")))
    agg = engine._finalize_df_hits(agg, repo)
    meta = engine._meta_path_df()
    topk = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
    return (meta.join(F.broadcast(topk), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .select("doc_id", "path", "score"))


def span_containing(engine, repo: str | None, big: tuple[str, str],
                    little: str, slop: int = 2, field: str = "text",
                    limit: int = 255) -> DataFrame:
    """``SpanContainingQuery(SpanNearQuery([big0, big1], slop, ordered),
    SpanTermQuery(little))``: big spans that contain a little occurrence;
    freq = the containing big spans.  Semantics/scale: :func:`_span_contain`."""
    return _span_contain(engine, repo, big, little, slop, field, limit,
                         within=False)


def span_within(engine, repo: str | None, big: tuple[str, str],
                little: str, slop: int = 2, field: str = "text",
                limit: int = 255) -> DataFrame:
    """``SpanWithinQuery(big, SpanTermQuery(little))``: little occurrences
    contained in a big span; freq = the contained little occurrences.
    Semantics/scale: :func:`_span_contain`."""
    return _span_contain(engine, repo, big, little, slop, field, limit,
                         within=True)


def explain_scores(engine, repo: str | None, terms: list[str],
                   field: str = "text", k: int = 3) -> DataFrame:
    """``IndexSearcher.explain(query, doc)`` analogue for a boolean-OR
    query: the per-(doc, term) score breakdown — tf, docFreq, idf, the
    length-normalized tf factor, and the term's score contribution — for
    each of the query's top-``k`` documents.  Lucene renders this as a
    nested Explanation tree; rows of (doc, term, factors) carry the same
    information in relational form, and ``sum(contribution) group by doc``
    reproduces the hit score exactly.

    Scale shape: the top-k docs come from the ordinary pruned search; the
    breakdown then touches only ``k × |terms|`` postings rows — the flat
    view is term-filtered at the parquet scan and doc-filtered by a
    broadcast of the k winners, so explain cost is independent of corpus
    size (Lucene's explain also re-scores one doc at a time).
    """
    from lucene_plugin_spark.query import bm25
    ts = sorted({t.lower() for t in terms})
    stats = engine._field_stats()
    n_docs, avgdl = stats.get(field, (0.0, 1.0))
    if n_docs == 0.0:
        return engine.spark.createDataFrame(
            [], "doc_id long, path string, term string, tf double, "
                "df double, idf double, tf_norm double, contribution double")
    hits = engine.search(repo, " ".join(ts), limit=k)
    topk = hits.select("doc_id", "path")
    dfm = engine._df_for_pairs([(field, t) for t in ts])
    td = engine.spark.createDataFrame(
        [(t, float(dfm.get((field, t), 0.0)),
          float(bm25.idf(dfm.get((field, t), 0.0), n_docs)))
         for t in ts if dfm.get((field, t), 0.0) > 0.0],
        "term string, df double, idf double")
    flat = (flat_postings_view(engine.spark, engine.catalog, terms=ts)
            .where(F.col("field") == field))
    tfc = F.col("tf").cast("double")
    tfn = (tfc * (bm25.K1 + 1.0)
           / (tfc + bm25.K1 * (1.0 - bm25.B
                               + bm25.B * F.col("dl") / F.lit(avgdl))))
    return (flat.join(F.broadcast(topk), "doc_id")
            .join(F.broadcast(td), "term")
            .select("doc_id", "path", "term", tfc.alias("tf"), "df", "idf",
                    tfn.alias("tf_norm"),
                    (F.col("idf") * tfn).alias("contribution"))
            .orderBy("doc_id", "term"))


def multi_phrase(engine, repo: str | None, slots: list[list[str]],
                 field: str = "text", slop: int = 0,
                 limit: int = 255, blended: bool = True) -> DataFrame:
    """``MultiPhraseQuery`` analogue: a phrase where each position admits
    several terms — ``[["table", "query"], ["hash"]]`` matches
    ``"table hash"`` OR ``"query hash"``.

    ``blended=True`` (default, round-4): exact Lucene ``MultiPhraseWeight``
    semantics — ONE scorer over slot-UNIONED position lists.
    ``tf(doc)`` counts anchor positions where every slot matches one of its
    alternatives (with slop, the engine's anchor-displacement weighting
    over the unioned arrays); ``idf`` sums over the flattened termArrays —
    every alternative of every slot (Lucene MultiPhraseQuery.getTermArrays
    flattening).  Under a one-term-per-position analyzer the slot unions
    are disjoint, so the union tf equals the sum of per-variant phrase tfs
    — which keeps the measure SQL-expressible for the DuckDB oracle.

    ``blended=False``: the round-3 rewrite — a scored OR over the cross
    product of per-slot choices; a doc's score is the SUM of each matching
    variant's OWN phrase BM25 (each variant keeps its own idf; documented
    deviation, kept for comparison and for the compiled-kernel path).

    Scale shape (blended): the flat-postings view is term-filtered BEFORE
    block decode (predicate pushed to the term-sorted parquet row groups),
    per-slot unions are doc_id-keyed aggs over ≤|alternatives| arrays, the
    alignment runs in whole-stage codegen via higher-order array functions
    (no Python), and only the top-k joins the path map."""
    from lucene_plugin_spark.query import bm25

    slots_l = [[t.lower() for t in s] for s in slots]
    if not blended:
        from itertools import product

        from lucene_plugin_spark.query.plan import Bool, Phrase
        variants = []
        for combo in product(*slots_l):
            variants.append(Phrase(field=field, terms=tuple(combo),
                                   offsets=tuple(range(len(combo))),
                                   slop=int(slop)))
        return engine.search_node(Bool(should=tuple(variants)), repo, limit)

    empty = "doc_id long, path string, score double"
    stats = engine._field_stats()
    n, avgdl = stats.get(field, (0.0, 1.0))
    all_terms = sorted({t for s in slots_l for t in s})
    dfm = engine._df_for_pairs([(field, t) for t in all_terms])
    # flattened-termArrays idf: every alternative of every slot contributes
    # (absent terms have df 0 -> contribute 0, matching an empty posting)
    idf_sum = float(sum(bm25.idf(dfm.get((field, t), 0.0), n)
                        for s in slots_l for t in s
                        if dfm.get((field, t), 0.0) > 0.0))
    if n == 0.0 or idf_sum == 0.0:
        return engine.spark.createDataFrame([], empty)
    flat = (flat_postings_view(engine.spark, engine.catalog, terms=all_terms)
            .where(F.col("field") == field))
    j = None
    for k, alts in enumerate(slots_l):
        # slot union: one token per position -> alternatives' position
        # arrays are disjoint per doc; flatten(collect_list) IS the union
        part = (flat.where(F.col("term").isin(sorted(set(alts))))
                .groupBy("doc_id")
                .agg(F.flatten(F.collect_list("positions")).alias(f"p{k}")))
        j = part if j is None else j.join(part, "doc_id")
    nslots = len(slots_l)
    ex = j.select("doc_id", F.explode("p0").alias("x"),
                  *[F.col(f"p{k}") for k in range(1, nslots)])
    if slop:
        def _absdiff(dd):
            return lambda v: F.abs(v - (F.col("x") + F.lit(dd)))

        disp = F.lit(0.0)
        for k in range(1, nslots):
            disp = disp + F.array_min(F.transform(
                F.col(f"p{k}"), _absdiff(k))).cast("double")
        keep = (ex.withColumn("_disp", disp)
                .where(F.col("_disp") <= float(slop)))
        tf = keep.groupBy("doc_id").agg(
            F.sum(1.0 / (1.0 + F.col("_disp"))).alias("tf"))
    else:
        keep = ex
        for k in range(1, nslots):
            keep = keep.where(F.array_contains(F.col(f"p{k}"),
                                               F.col("x") + F.lit(k)))
        tf = keep.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("double").alias("tf"))
    lens = (engine._tbl("field_lens").where(F.col("field") == field)
            .select("doc_id", "dl"))
    tfn = (F.col("tf") * (bm25.K1 + 1.0)
           / (F.col("tf") + bm25.K1 * (1.0 - bm25.B
                                       + bm25.B * F.col("dl") / F.lit(avgdl))))
    agg = (tf.join(lens, "doc_id")
           .select("doc_id", (F.lit(idf_sum) * tfn).alias("score")))
    agg = engine._finalize_df_hits(agg, repo)
    meta = engine._meta_path_df()
    topk = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
    return (meta.join(F.broadcast(topk), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .select("doc_id", "path", "score"))


def phrase_prefix(engine, repo: str | None, terms: list[str], prefix: str,
                  field: str = "text", slop: int = 0, limit: int = 255,
                  max_expansions: int = 50) -> DataFrame:
    """Phrase-prefix query — the use case ``MultiPhraseQuery``'s own javadoc
    names (a phrase ending in ``app*``), ``match_phrase_prefix`` in the
    wider Lucene ecosystem: a phrase whose LAST position admits every
    dictionary term starting with ``prefix``.  The prefix expands against
    the term dictionary in TERM ORDER capped at ``max_expansions``
    (the ecosystem default 50), then scores through the blended
    MultiPhraseQuery analogue (:func:`multi_phrase`): ONE scorer, tf over
    the slot-unioned position lists, idf summed over the literal terms plus
    the expansion set (flattened termArrays).

    Scale shape: the expansion is a sargable ``startswith`` range on the
    term-sorted dictionary (parquet range pruning, never a vocabulary
    scan), bounded at ``max_expansions`` terms; execution inherits
    multi_phrase's shape — term-pruned postings scan, JVM array alignment
    in whole-stage codegen, broadcast top-k path join."""
    from lucene_plugin_spark.query.plan import Wildcard
    w = Wildcard(field=field, pattern=prefix.lower() + "*")
    exp = engine._expand_ranges([w])[w][:max_expansions]
    if not exp:
        return engine.spark.createDataFrame(
            [], "doc_id long, path string, score double")
    slots = [[t] for t in terms] + [exp]
    return multi_phrase(engine, repo, slots, field=field, slop=slop,
                        limit=limit)


def complex_phrase(engine, repo: str | None, slots: list[str],
                   field: str = "text", slop: int = 0, limit: int = 255,
                   max_expansions: int = 50) -> DataFrame:
    """``ComplexPhraseQueryParser`` analogue (lucene queryparser module,
    5.2): a phrase where ANY position — not just the last, which is
    :func:`phrase_prefix`'s special case — may be a wildcard (``para*``,
    ``f?x``) or fuzzy (``cache~``, ``cache~1``) pattern.  Each pattern slot
    expands against the term dictionary in TERM ORDER capped at
    ``max_expansions``; literal slots pass through; execution and scoring
    are the blended :func:`multi_phrase` (one scorer, slot-unioned
    positions, idf over the flattened termArrays).

    Scale shape: expansion reuses the engine's MultiTermQuery machinery —
    prefix wildcards are sargable dictionary range scans, infix wildcards
    and ≤2-edit fuzzies route through the ``spell_grams`` sidecar when no
    resident dictionary exists (cost bounded by the query grams' postings,
    never the vocabulary); all pattern slots expand in ONE batched call.
    Execution inherits multi_phrase's term-pruned postings scan."""
    import re as _re

    from lucene_plugin_spark.query.plan import Fuzzy, Wildcard
    empty = "doc_id long, path string, score double"
    parsed: list[object] = []
    for s in slots:
        s = s.lower()
        m = _re.fullmatch(r"([^*?~]+)~([0-2])?", s)
        if m:
            parsed.append(Fuzzy(field=field, term=m.group(1),
                                max_edits=int(m.group(2) or 2)))
        elif "*" in s or "?" in s:
            parsed.append(Wildcard(field=field, pattern=s))
        else:
            parsed.append(s)
    leaves = [p for p in parsed if not isinstance(p, str)]
    exp = engine._expand_ranges(leaves) if leaves else {}
    out_slots: list[list[str]] = []
    for p in parsed:
        if isinstance(p, str):
            out_slots.append([p])
        else:
            terms = exp[p][:max_expansions]
            if not terms:  # a dead slot kills the whole phrase
                return engine.spark.createDataFrame([], empty)
            out_slots.append(terms)
    return multi_phrase(engine, repo, out_slots, field=field, slop=slop,
                        limit=limit)


def common_terms(engine, repo: str | None, terms: list[str],
                 field: str = "text", max_term_frequency: float = 0.01,
                 limit: int = 255) -> DataFrame:
    """``CommonTermsQuery`` (lucene-queries module, present in the
    reference's Lucene 5.2.1): split the query terms into LOW-frequency
    (df <= ``max_term_frequency``, absolute when >= 1 else a fraction of
    the doc count — Lucene's ``maxTermFrequency``) and HIGH-frequency
    groups.  Docs MUST match at least one low-frequency term; high-
    frequency terms only ADD score on docs already selected — Lucene's
    rewrite ``BooleanQuery{ MUST(lowFreq-OR), SHOULD(highFreq-OR) }``, the
    stopword-free way to keep "the"-like terms from selecting the whole
    corpus.  When every term is high-frequency the query degrades to the
    plain OR over them, exactly like Lucene with an empty low group.
    Per-term scoring is the ordinary boolean-OR BM25 (per-term idf x
    tf-norm, summed).

    Scale shape: ONE term-pruned postings scan for all terms (the low/high
    split is a driver-side df lookup from the cached stats, no extra job),
    a literal term->idf map, and one map-side-combined groupBy(doc_id);
    the must-match-low requirement rides the same aggregation as a
    max(flag) — no second scan, no extra shuffle."""
    from lucene_plugin_spark.query import bm25
    empty = "doc_id long, path string, score double"
    ts = sorted({t.lower() for t in terms})
    stats = engine._field_stats()
    n_docs, avgdl = stats.get(field, (0.0, 1.0))
    dfm = engine._df_for_pairs([(field, t) for t in ts])
    present = [t for t in ts if dfm.get((field, t), 0.0) > 0.0]
    if n_docs == 0.0 or not present:
        return engine.spark.createDataFrame([], empty)
    cut = (float(max_term_frequency) if max_term_frequency >= 1.0
           else float(max_term_frequency) * n_docs)
    low = [t for t in present if dfm[(field, t)] <= cut]
    idf = {t: float(bm25.idf(dfm[(field, t)], n_docs)) for t in present}
    flat = (flat_postings_view(engine.spark, engine.catalog, terms=present)
            .where(F.col("field") == field))
    idf_col = F.create_map(*[x for t in present
                             for x in (F.lit(t), F.lit(idf[t]))])
    tfc = F.col("tf").cast("double")
    tfn = (tfc * (bm25.K1 + 1.0)
           / (tfc + bm25.K1 * (1.0 - bm25.B
                               + bm25.B * F.col("dl") / F.lit(avgdl))))
    low_flag = (F.col("term").isin(low).cast("int") if low else F.lit(0))
    per = flat.select("doc_id",
                      (idf_col[F.col("term")] * tfn).alias("c"),
                      low_flag.alias("is_low"))
    agg = (per.groupBy("doc_id")
           .agg(F.sum("c").alias("score"), F.max("is_low").alias("has_low")))
    if low:
        agg = agg.where(F.col("has_low") == 1)
    agg = engine._finalize_df_hits(agg.select("doc_id", "score"), repo)
    meta = engine._meta_path_df()
    topk = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
    return (meta.join(F.broadcast(topk), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .select("doc_id", "path", "score"))


def boosting(engine, repo: str | None, query: str, negative_query: str,
             negative_boost: float = 0.2, limit: int = 255) -> DataFrame:
    """``BoostingQuery`` (lucene-queries module, present in the reference's
    Lucene 5.2.1): match exactly the docs ``query`` matches, but DEMOTE any
    match that also matches ``negative_query`` by multiplying its score by
    ``negative_boost`` (< 1).  The negative query never selects or rejects
    documents — it only reorders, the classic "downweight but don't exclude"
    tool (vs ``-term`` which drops the doc entirely).

    Needs the FULL positive match set (a demotion anywhere can promote any
    other match into the top-k — same contract as :func:`function_score`,
    and Lucene's BoostingQuery scorer also visits every positive hit).  The
    negative side contributes only a docID set; its scores are discarded,
    so a selective negative query bounds the extra cost.

    Scale shape: two ordinary pruned searches + one doc_id equi-join
    (AQE-broadcastable when the negative match set is small), demotion
    arithmetic in whole-stage codegen, one top-k sort."""
    if negative_boost < 0:
        raise ValueError(
            f"negative_boost must be >= 0, got {negative_boost}")
    pos = engine.search_node(
        parse_query(query, variant=engine.analyzer), repo, limit=_ALL)
    neg = (engine.search_node(
               parse_query(negative_query, variant=engine.analyzer),
               repo, limit=_ALL)
           .select("doc_id", F.lit(True).alias("_neg")))
    demoted = F.when(F.col("_neg"),
                     F.col("score") * F.lit(float(negative_boost))) \
               .otherwise(F.col("score"))
    return (pos.join(neg, "doc_id", "left")
            .select("doc_id", "path", demoted.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(limit))


def join_query(engine, repo: str | None, from_query: str, from_field: str,
               to_field: str | None = None, score_mode: str = "max",
               limit: int = 255) -> DataFrame:
    """``JoinUtil.createJoinQuery`` (lucene-join module, 5.2): query-time
    join inside one index.  Docs matching ``from_query`` contribute their
    ``from_field`` terms; every doc whose ``to_field`` contains one of
    those terms matches.  Per join term, the from-side scores aggregate by
    ``score_mode`` (Lucene's ``ScoreMode``): ``max`` / ``total`` (sum) /
    ``avg`` / ``none`` (constant 1).  A to-doc matching several join terms
    takes the MAX of their term scores — Lucene leaves that multi-term case
    explicitly unspecified ("an arbitrary one"), so we pin the
    deterministic refinement that equals Lucene whenever a to-doc matches
    one join term (the common single-valued-field case).

    Scale shape: the from side is one ordinary pruned search joined to the
    field-pruned postings scan on doc_id (never a collect — the join-term
    set stays distributed); per-term aggregation is one map-side-combined
    groupBy; the to side is the field-pruned postings scan equi-joined on
    term (broadcast when the term set is small, AQE decides); one more
    groupBy(doc_id) for the multi-term max.  Total: two field-pruned scans
    + two key-bounded shuffles, no corpus-wide pass."""
    mode = score_mode.lower()
    if mode not in ("max", "total", "sum", "avg", "none"):
        raise ValueError(f"unknown score_mode: {score_mode!r}")
    to_field = to_field or from_field
    from_hits = (engine.search_node(
                     parse_query(from_query, variant=engine.analyzer),
                     repo, limit=_ALL)
                 .select("doc_id", "score"))
    from_terms = (flat_postings_view(engine.spark, engine.catalog,
                                     fields=[from_field])
                  .select("doc_id", "term")
                  .join(from_hits, "doc_id"))
    if mode == "none":
        term_scores = (from_terms.select("term").distinct()
                       .withColumn("_ts", F.lit(1.0)))
    else:
        agg_fn = {"max": F.max, "total": F.sum, "sum": F.sum,
                  "avg": F.avg}[mode]
        term_scores = (from_terms.groupBy("term")
                       .agg(agg_fn("score").alias("_ts")))
    to_post = (flat_postings_view(engine.spark, engine.catalog,
                                  fields=[to_field])
               .select("doc_id", "term"))
    agg = (to_post.join(term_scores, "term")
           .groupBy("doc_id").agg(F.max("_ts").alias("score")))
    agg = engine._finalize_df_hits(agg, repo)
    meta = engine._meta_path_df()
    topk = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
    return (meta.join(F.broadcast(topk), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .select("doc_id", "path", "score"))


def multi_field(engine, repo: str | None, query: str, fields: list[str],
                boosts: dict[str, float] | None = None,
                limit: int = 255) -> DataFrame:
    """``MultiFieldQueryParser`` analogue: parse ``query`` with the classic
    grammar, then rewrite every leaf still on the DEFAULT field into a
    SHOULD-disjunction of the same leaf over ``fields`` (per-field boost
    from ``boosts``, default 1.0) — exactly
    ``MultiFieldQueryParser(fields, analyzer, boosts)``, where each clause
    becomes a BooleanQuery over the fields.  Explicitly field-qualified
    leaves (``lang:en``) keep their field, like Lucene.

    Scale shape: the rewrite is a driver-side tree transform; execution is
    the ordinary :meth:`SearchEngine.search_node` — each per-field Term
    scores against its own field statistics (Lucene's per-field
    Similarity), the postings scan's term/field predicates stay pushed.
    """
    node = rewrite_multi_field(parse_query(query, variant=engine.analyzer),
                               fields, boosts)
    return engine.search_node(node, repo, limit)


def rewrite_multi_field(node, fields: list[str],
                        boosts: dict[str, float] | None = None):
    """The ``MultiFieldQueryParser`` leaf rewrite as a standalone tree
    transform (shared with the SimpleQueryParser's ``weights`` map): every
    leaf still on the DEFAULT field becomes a SHOULD-disjunction of itself
    over ``fields`` with per-field boosts."""
    import dataclasses

    from lucene_plugin_spark.query.plan import (DEFAULT_FIELD, Bool, DisMax,
                                                Fuzzy, Phrase, Range, Regexp,
                                                SynSet, Term, Wildcard)
    b = boosts or {}

    def per_field(leaf) -> Bool:
        return Bool(should=tuple(
            dataclasses.replace(leaf, field=f,
                                boost=leaf.boost * b.get(f, 1.0))
            for f in fields))

    def rw(n):
        if isinstance(n, Bool):
            return dataclasses.replace(
                n, should=tuple(rw(c) for c in n.should),
                must=tuple(rw(c) for c in n.must),
                must_not=tuple(rw(c) for c in n.must_not),
                filter=tuple(rw(c) for c in n.filter))
        if isinstance(n, DisMax):
            return dataclasses.replace(
                n, disjuncts=tuple(rw(c) for c in n.disjuncts))
        if (isinstance(n, (Term, Phrase, Range, Wildcard, Regexp, Fuzzy,
                           SynSet))
                and n.field == DEFAULT_FIELD):
            return per_field(n)
        return n

    return rw(node)


def federated_search(engines: list[tuple[str, object]], repo: str | None,
                     query: str, limit: int = 10) -> DataFrame:
    """Fan a query out across several independent indexes and merge one
    top-k — the ``MultiReader`` / cross-cluster-search shape, except each
    index KEEPS its own corpus statistics (df/N/avgdl) and its own analyzer,
    exactly like federated Lucene deployments where per-shard IDF is not
    blended.  Ties across indexes break on (index asc, doc_id asc) so the
    merged cut is deterministic.

    Scale shape: per-index top-``limit`` is each engine's ordinary pruned
    search; the merge unions k-row frames — driver-side cost O(n_indexes *
    limit), never corpus-bound."""
    parts = []
    for name, eng in engines:
        parts.append(eng.search(repo, query, limit=limit)
                     .select(F.lit(name).alias("index"),
                             "doc_id", "path", "score"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (out.orderBy(F.desc("score"), F.asc("index"), F.asc("doc_id"))
            .limit(limit))
