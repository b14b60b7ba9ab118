"""Result-set post-processing: highlighting, faceting, grouped top-k.

Lucene ships these as separate modules over a searcher's hits
(``lucene-highlighter``, ``lucene-facet``, ``lucene-grouping``); the
reference bundles only core search (service/build.gradle pulls
lucene-core+queryparser 5.2.1), but any real deployment of it pairs search
with these, so they are first-class here — expressed as DataFrame
transforms over the engine's hits frame and its stored-field tables.

Scale shape:
- ``highlight`` touches only the top-k rows: the k-row hit frame is
  broadcast against the stored ``docs`` table (same S7 stored-field-fetch
  pattern as query/executor.py:350-359 — broadcast the k rows, never the
  corpus), and the snippet itself is pure JVM string functions (locate/
  substring/replace), no Python in the loop.
- ``facet_counts`` / ``group_top_k`` consume the full match set: one
  equi-join against the skinny ``docs_meta`` table (the docvalues
  analogue: doc_id -> lang/repo, no content column) followed by a
  map-side-combined aggregation / a per-group window.  At 100 TB the join
  is doc_id-aligned on both sides (docs_meta is written slice-partitioned
  by the builder), so AQE plans it as a shuffle-light join; the facet agg
  output is |distinct values|, not |hits|.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _docs_meta(engine, cols: list[str]) -> DataFrame:
    return (engine.catalog.table("docs_meta").read(engine.spark)
            .select("doc_id", *cols))


def highlight(engine, hits: DataFrame, term: str, field_col: str = "content",
              window: int = 40, pre: str = "<em>", post: str = "</em>") -> DataFrame:
    """Snippet extraction around the first whole-word match of ``term``.

    Lucene highlighter analogue with a deterministic, SQL-reproducible
    fragmenter: the snippet is the ``window``-char substring of
    ``' ' || content || ' '`` starting at the first ``' term '``
    occurrence, with every whole-word occurrence inside the window wrapped
    in ``pre``/``post``.  Rows where the term never occurs as a whole word
    (e.g. hits from other leaves of an OR) keep a NULL snippet.

    Returns DataFrame(doc_id, path, score, snippet).
    """
    docs = engine.catalog.table("docs").read(engine.spark)
    k = hits.select("doc_id", "path", "score")
    # broadcast the k-row side into the partitioned docs scan (S7 pattern)
    j = docs.select("repo", "path", F.col(field_col).alias("_content")).join(
        F.broadcast(k.join(_docs_meta(engine, ["repo"]), "doc_id")),
        ["repo", "path"])
    padded = F.concat(F.lit(" "), F.col("_content"), F.lit(" "))
    needle = F.lit(f" {term} ")
    pos = F.locate(f" {term} ", padded)
    snip = F.substring(padded, pos, window)
    wrapped = F.replace(snip, needle, F.lit(f" {pre}{term}{post} "))
    return (j.select("doc_id", "path", "score",
                     F.when(pos > 0, wrapped).alias("snippet"))
            .orderBy(F.desc("score"), F.asc("doc_id")))


def facet_counts(engine, hits: DataFrame,
                 facets: list[str] = ("lang", "repo")) -> DataFrame:
    """Facet counts over a match set (Lucene SSDV facets analogue).

    ``hits`` is the engine's (possibly untruncated) hit frame; each facet
    column is resolved from ``docs_meta`` — the stored per-doc values —
    and counted.  One join + one grouped count per facet; counts are
    map-side combined so the shuffle carries |distinct values| rows.

    Returns DataFrame(facet, value, doc_count) ordered by (facet, value).
    """
    meta = _docs_meta(engine, list(facets))
    m = hits.select("doc_id").join(meta, "doc_id")
    parts = [
        m.groupBy(F.col(c).alias("value"))
         .agg(F.count("*").alias("doc_count"))
         .select(F.lit(c).alias("facet"), "value", "doc_count")
        for c in facets
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("facet", "value")


def best_passages(engine, repo, terms: list[str], field: str = "text",
                  width: int = 16, limit: int = 10) -> DataFrame:
    """Best-passage extraction (``PostingsHighlighter`` /
    ``UnifiedHighlighter`` analogue): for each of the query's top
    ``limit`` docs, rank PASSAGES — fixed ``width``-token windows over the
    document — by the summed idf-weighted occurrence count of the query
    terms inside the window, and return the winning window with its text.
    Lucene's PassageScorer reads term positions/offsets straight off the
    postings; ours reads the SAME per-doc position arrays the phrase
    scorer decodes, so no re-analysis happens — the passage index is
    ``floor(position / width)`` and the snippet is the corresponding word
    slice of the stored text.

    Scorer: ``score(passage) = Σ_t idf(t) · occurrences_t(passage)`` (the
    linear-tf instance of the PassageScorer family), tie-break earliest
    passage.  Returns DataFrame(doc_id, path, passage, p_score, snippet)
    ordered by the base ranking.

    Scale shape: positions come from the term-pruned postings scan
    semi-joined to the broadcast top-k docIDs (k rows, never the corpus);
    the snippet join broadcasts the k winners against the stored docs
    table — the S7 stored-field-fetch pattern, same as :func:`highlight`.
    """
    from lucene_plugin_spark.index.builder import flat_postings_view
    from lucene_plugin_spark.query import bm25
    toks = sorted({t.lower() for t in terms if t})
    hits = engine.search(repo, " ".join(toks), limit=limit)
    k = hits.select("doc_id", "path", "score")
    stats = engine._field_stats()
    n_docs, _avgdl = stats.get(field, (0.0, 1.0))
    dfs = engine._df_for_pairs([(field, t) for t in toks])
    idf = {t: float(bm25.idf(float(dfs.get((field, t), 0.0)), n_docs))
           for t in toks if dfs.get((field, t))}
    if not idf or n_docs == 0.0:
        return engine.spark.createDataFrame(
            [], "doc_id long, path string, passage int, p_score double, "
                "snippet string")
    idf_df = engine.spark.createDataFrame(
        list(idf.items()), "term string, idf double")
    flat = (flat_postings_view(engine.spark, engine.catalog,
                               terms=sorted(idf))
            .where(F.col("field") == field)
            .join(F.broadcast(k.select("doc_id")), "doc_id")
            .join(F.broadcast(idf_df), "term"))
    occ = flat.select(
        "doc_id", "idf",
        F.explode("positions").alias("pos"))
    scored = (occ.withColumn("passage",
                             F.floor(F.col("pos") / width).cast("int"))
              .groupBy("doc_id", "passage")
              .agg(F.sum("idf").alias("p_score")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("p_score"),
                                             F.asc("passage"))
    best = (scored.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1).select("doc_id", "passage", "p_score"))
    docs = engine.catalog.table("docs").read(engine.spark)
    j = (docs.select("repo", "path", F.col("content").alias("_content"))
         .join(F.broadcast(
             k.join(best, "doc_id")
             .join(_docs_meta(engine, ["repo"]), "doc_id")),
             ["repo", "path"]))
    # slice by ANALYZER positions, not a whitespace split: the scored
    # occurrences live at post-split pre-stop ordinals, so the window must
    # be cut from the same token stream (token_array_col is the Column
    # twin of the Arrow kernel's pre-stop output — camelCase splits,
    # UAX#29 mid-word punctuation and empty-run artifacts all align)
    from lucene_plugin_spark.analysis.tokenizer import token_array_col
    words = token_array_col(F.col("_content"))
    snip = F.concat_ws(
        " ", F.slice(words, F.col("passage") * width + 1, width))
    return (j.select("doc_id", "path", "passage", "p_score",
                     snip.alias("snippet"), "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .drop("score"))


def drill_sideways(engine, hits: DataFrame, drill: dict[str, str],
                   facets: list[str]) -> DataFrame:
    """``DrillSideways`` (lucene-facet): facet counts for a base match set
    under drill-down filters, with the SIDEWAYS semantics — a drilled
    dimension's counts are computed with every OTHER drill filter applied
    but NOT its own (so the UI can offer the dimension's sibling values),
    while un-drilled dimensions count over the fully drilled-down set.

    ``hits`` is the base query's (untruncated) hit frame; ``drill`` maps
    facet column -> required stored value (``DrillDownQuery.add``); each
    facet in ``facets`` yields its own count rows.  One ``docs_meta`` join
    feeds every dimension's grouped count — Catalyst reuses the joined
    plan, each count is map-side combined, and the drill predicates are
    plain column equalities on the skinny stored-fields table.

    Returns DataFrame(facet, value, doc_count) ordered by (facet, value).
    """
    if not facets:
        return engine.spark.createDataFrame(
            [], "facet string, value string, doc_count bigint")
    cols = sorted({*drill, *facets})
    meta = _docs_meta(engine, cols)
    j = hits.select("doc_id").join(meta, "doc_id")
    parts = []
    for dim in facets:
        side = j
        for d, v in drill.items():
            if d != dim:        # sideways: drop only the dim's OWN filter
                side = side.where(F.col(d) == v)
        parts.append(side.groupBy(F.col(dim).alias("value"))
                     .agg(F.count(F.lit(1)).alias("doc_count"))
                     .select(F.lit(dim).alias("facet"), "value",
                             "doc_count"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("facet", "value")


def drill_down_hits(engine, hits: DataFrame,
                    drill: dict[str, str]) -> DataFrame:
    """``DrillDownQuery`` hit set: the base hits filtered to every drilled
    stored value (the docs `drill_sideways` shows beside its counts)."""
    meta = _docs_meta(engine, sorted(drill))
    j = hits.join(meta, "doc_id")
    for d, v in drill.items():
        j = j.where(F.col(d) == v)
    return j.select(*hits.columns)


def group_top_k(engine, hits: DataFrame, group_col: str = "lang",
                k: int = 2, tie_col: str = "doc_id") -> DataFrame:
    """Grouped top-k hits (lucene-grouping ``TopGroups`` analogue): the k
    best-scoring docs per distinct value of ``group_col``, rank order
    (score desc, ``tie_col`` asc) within each group.

    Window over the match set partitioned by the group value — Spark's
    ranking window does the per-group heap; no driver-side grouping.

    Returns DataFrame(group, rank, doc_id, path, score).
    """
    meta = _docs_meta(engine, [group_col])
    w = (Window.partitionBy(group_col)
         .orderBy(F.desc("score"), F.asc(tie_col)))
    return (hits.join(meta, "doc_id")
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col(group_col).alias("group"), "rank",
                    "doc_id", "path", "score")
            .orderBy("group", "rank"))


def to_parent_join(engine, hits: DataFrame, parent_of,
                   score_mode: str = "max") -> DataFrame:
    """Child-hits -> parent-hits join (``ToParentBlockJoinQuery`` analogue,
    the lucene-join module's block join).

    In Lucene, parent and child documents are indexed as one contiguous
    block and the parent is the block's trailing doc; each matching child's
    score folds into its parent per ``ScoreMode``.  Our docIDs are dense and
    assigned in (repo, path) order, so any monotone docID/path -> parent map
    expresses the same block structure; ``parent_of`` is that map as a
    Column over the hit frame (e.g. ``F.floor(F.col("path").cast("int")/10)``
    for 10-child blocks).

    ``score_mode``: ``max`` | ``total`` | ``avg`` | ``min`` (Lucene
    ScoreMode.Max/Total/Avg/Min) | ``none`` (parents score 1.0, membership
    only).  Returns DataFrame(parent, score, n_children) ordered
    (score desc, parent asc) — the parent-level tie-break.

    Scale shape: one grouped aggregation over the match set, map-side
    combined, output |matching parents| rows; no join against the corpus.
    """
    aggs = {"max": F.max, "total": F.sum, "avg": F.avg, "min": F.min}
    g = hits.withColumn("parent", parent_of)
    if score_mode == "none":
        out = g.groupBy("parent").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_children")
        ).withColumn("score", F.lit(1.0))
    elif score_mode in aggs:
        out = g.groupBy("parent").agg(
            aggs[score_mode]("score").alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_children"))
    else:
        raise ValueError(f"unknown score_mode {score_mode!r}")
    return (out.select("parent", "score", "n_children")
            .orderBy(F.desc("score"), F.asc("parent")))


def to_child_join(engine, parents: DataFrame, parent_of,
                  repo: str | None = None) -> DataFrame:
    """Parent-hits -> child-hits join (``ToChildBlockJoinQuery`` analogue,
    the other direction of the lucene-join block join): every document in
    a matching parent's block becomes a hit and INHERITS the parent's score
    (Lucene's ToChildBlockJoinScorer hands the parent score to each child).

    ``parents`` is a (parent, score) frame — e.g. :func:`to_parent_join`
    output, or any parent-level match set; ``parent_of`` is the same
    monotone docID/path -> parent Column used to define the blocks.
    ``repo`` scopes the CHILD side: unlike ``to_parent_join`` (inherently
    scoped by its hits), the child direction expands against the corpus
    meta frame, so without the scope a repo-filtered parent set could
    inherit children from OTHER repos whose ``parent_of`` key collides —
    pass the same repo the parent hits were computed under.

    Scale shape: one equi-join of the skinny docs_meta (doc_id, path) scan
    against the parent hit set on the block key — AQE broadcasts the
    parent side when the match set is small; no shuffle of the corpus.
    The repo scope is the collection docID-range predicate (contiguous
    ranges, parquet-prunable), applied by ``_finalize_df_hits``.

    Returns DataFrame(doc_id, path, parent, score) ordered
    (score desc, doc_id asc).
    """
    meta = engine._meta_path_df().withColumn("parent", parent_of)
    kids = (meta.join(parents.select("parent", "score"), "parent")
            .select("doc_id", "path", "parent", "score"))
    # liveDocs (tombstoned children must not resurface through their
    # block) + the collection scope
    kids = engine._finalize_df_hits(kids, repo)
    return kids.orderBy(F.desc("score"), F.asc("doc_id"))


def range_facet_counts(engine, hits: DataFrame,
                       ranges: list[tuple[str, int, int | None]],
                       field: str = "text") -> DataFrame:
    """Numeric range facets over a match set (``LongRangeFacetCounts``
    analogue, lucene-facet module): count matching docs whose per-field
    token length (the ``field_lens`` docvalue — dl, what BM25 normalizes
    by) falls in each requested range.

    ``ranges``: (label, lo, hi) with inclusive lo and exclusive hi
    (``hi=None`` = unbounded).  Ranges may overlap and every requested
    range yields a row (count 0 included) — Lucene counts each LongRange
    independently.

    Scale shape: one doc_id equi-join against the skinny field_lens table
    (docvalues analogue, no content column) then a SINGLE conditional
    aggregation producing one row — all ranges counted in one pass, the
    shuffle carries one row per partition.  ``stack`` unpivots driver-side
    schema-only; no per-range scans.
    """
    lens = (engine.catalog.table("field_lens").read(engine.spark)
            .where(F.col("field") == field).select("doc_id", "dl"))
    m = hits.select("doc_id").join(lens, "doc_id")
    aggs = []
    for i, (label, lo, hi) in enumerate(ranges):
        cond = F.col("dl") >= F.lit(lo)
        if hi is not None:
            cond = cond & (F.col("dl") < F.lit(hi))
        aggs.append(F.coalesce(F.sum(cond.cast("long")), F.lit(0))
                    .alias(f"_r{i}"))
    row = m.agg(*aggs)
    stack_args = ", ".join(
        f"'{label}', {lo}L, "
        f"{('CAST(NULL AS BIGINT)' if hi is None else str(hi) + 'L')}, _r{i}"
        for i, (label, lo, hi) in enumerate(ranges))
    return (row.select(F.expr(
        f"stack({len(ranges)}, {stack_args}) AS (label, lo, hi, doc_count)"))
        .orderBy("lo", "label"))
