"""Source-code curation operators: license detection, comment analysis,
identifier sub-token statistics.

The north rule's corpus is source code (input_hint: Iceberg table of
repositories with a ``content`` column); these are the code-specific
curation stages a pre-training pipeline runs over such a corpus — license
filtering (The Stack's permissive-license screen), comment-aware dedup keys
(strip comments so forked files with edited headers still collide), and
identifier-vocabulary statistics (camelCase/snake_case sub-token counts,
the code analogue of word frequency).  The reference engine has no
counterpart — extensions per the brief, like ops/curation.py.

Scale notes (100 TB):

- all three are pure map passes: JVM ``contains`` / ``regexp_replace`` /
  ``split`` inside whole-stage codegen, zero Python; identifier stats add
  ONE hash aggregation over (term) — map-side combined, vocabulary-sized
  output (bounded: sub-tokens are short lowercase strings, the distinct set
  is millions, not corpus-sized);
- patterns are Java∩RE2 (no lookarounds/backrefs) so the same strings run
  in Spark and the DuckDB oracle — the camel seam splits are exactly the
  analyzer's (analysis/tokenizer.py _CAMEL_1/_CAMEL_2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: (spdx_id, lowercase needle) — matched in order, first hit wins (a file
#: that quotes two licenses classifies as the earlier, deterministic rule)
LICENSE_NEEDLES: list[tuple[str, str]] = [
    ("mit", "permission is hereby granted, free of charge"),
    ("apache-2.0", "licensed under the apache license, version 2.0"),
    ("gpl-3.0", "gnu general public license"),
    ("bsd-3-clause", "redistribution and use in source and binary forms"),
]

#: line-comment markers (language-agnostic union; block comments are out of
#: scope — the detector is a screen, not a parser)
COMMENT_LINE_RE = r"^[ \t]*(//|#|\*|--|;;)"

# camelCase seams — identical pattern text to the index analyzer
CAMEL_1 = (r"([a-z0-9])([A-Z])", "$1 $2")
CAMEL_2 = (r"([A-Z])([A-Z][a-z])", "$1 $2")


def detect_license(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "content") -> DataFrame:
    """(id, license) — first matching needle in lowercase content, else
    'unknown'.  One codegen'd CASE over the scan; no shuffle."""
    low = F.lower(F.col(text_col))
    expr = F.lit("unknown")
    for spdx, needle in reversed(LICENSE_NEEDLES):
        expr = F.when(low.contains(needle), F.lit(spdx)).otherwise(expr)
    return df.select(F.col(id_col), expr.alias("license"))


def comment_stats(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "content") -> DataFrame:
    """(id, n_lines, n_comment_lines, comment_ratio, code_sha256).

    ``code_sha256`` hashes the file with comment lines removed and
    whitespace-only lines dropped — the comment-insensitive dedup key
    (forked files that only edited headers/comments collide on it)."""
    lines = F.split(F.col(text_col), "\n")
    is_comment = lambda l: l.rlike(COMMENT_LINE_RE)  # noqa: E731
    code_lines = F.filter(lines, lambda l: ~is_comment(l)
                          & (F.trim(l) != F.lit("")))
    n_lines = F.size(lines)
    n_comment = F.size(F.filter(lines, is_comment))
    return df.select(
        F.col(id_col),
        n_lines.cast("bigint").alias("n_lines"),
        n_comment.cast("bigint").alias("n_comment_lines"),
        F.round(n_comment.cast("double") / n_lines, 6).alias("comment_ratio"),
        F.sha2(F.array_join(code_lines, "\n"), 256).alias("code_sha256"))


def split_identifiers(col) -> "F.Column":
    """Column of code text -> array of lowercase sub-tokens after camelCase /
    snake_case / digit-seam splitting — the analyzer's splitting rule as a
    plain SQL expression (shareable with the DuckDB oracle verbatim)."""
    s = F.regexp_replace(col, CAMEL_1[0], CAMEL_1[1])
    s = F.regexp_replace(s, CAMEL_2[0], CAMEL_2[1])
    return F.filter(F.split(F.lower(s), "[^a-z0-9]+"), lambda t: t != F.lit(""))


def identifier_stats(df: DataFrame, text_col: str = "content",
                     top_k: int = 20) -> DataFrame:
    """(term, n) — the ``top_k`` most frequent identifier sub-tokens, ties
    broken term-asc.  explode -> one map-side-combined hash agg -> top-k
    (TakeOrderedAndProject, never a global sort)."""
    toks = df.select(F.explode(split_identifiers(F.col(text_col))).alias("term"))
    return (toks.groupBy("term").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("term")).limit(top_k))


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "content", k: int = 5,
                        w: int = 4) -> DataFrame:
    """(id, pos, fp): WINNOWING document fingerprints (Schleimer, Wilkerson
    & Aiken, SIGMOD 2003 — the MOSS code-clone algorithm): hash every
    token ``k``-gram, slide a window of ``w`` consecutive hashes, keep each
    window's minimum (RIGHTMOST minimum on ties — robust winnowing), and
    deduplicate selections.  Guarantees: any shared token run of length
    >= ``w + k - 1`` yields a shared fingerprint, and the fingerprint
    density is ~2/(w+1) of grams — boilerplate-scale clone detection
    without storing every gram.

    Scale shape: the entire selection runs INSIDE one projection with
    higher-order array functions (k-gram hashes, per-window slices,
    rightmost-min via reversed array_position) — per-row compute, no
    shuffle, no Python; only the exploded (id, pos, fp) rows leave the
    map stage.  Docs with fewer than ``k`` tokens produce nothing; docs
    with fewer than ``w`` grams produce the single all-gram window's min,
    the standard short-document degradation.
    """
    from lucene_plugin_spark.ops.dedup import TOKEN_SPLIT_RE
    if k < 1 or w < 1:
        raise ValueError(f"need k >= 1 and w >= 1, got k={k} w={w}")
    toks = F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                    lambda x: x != "")
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    ng = F.size("toks") - (k - 1)

    def gram_hash(i):
        gram = F.concat_ws(" ", F.slice("toks", i, k))
        return (F.conv(F.substring(F.md5(gram), 1, 15), 16, 10)
                .cast("long"))

    hs = F.when(ng >= 1, F.transform(F.sequence(F.lit(1), ng), gram_hash)) \
        .otherwise(F.array().cast("array<long>"))
    base = base.select("id", hs.alias("hs"))
    nh = F.size("hs")
    nw = F.greatest(nh - (w - 1), F.least(nh, F.lit(1)))

    def pick(s):
        sl = F.slice("hs", s, w)
        mn = F.array_min(sl)
        posrev = F.array_position(F.reverse(sl), mn)
        return F.struct((s + F.size(sl) - posrev).alias("pos"),
                        mn.alias("fp"))

    sel = F.when(nh >= 1, F.array_distinct(
        F.transform(F.sequence(F.lit(1), nw), pick))) \
        .otherwise(F.array().cast("array<struct<pos:int,fp:long>>"))
    return (base.select("id", F.explode(sel).alias("s"))
            .select("id", F.col("s.pos").alias("pos"),
                    F.col("s.fp").alias("fp")))


def winnow_clone_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "content", k: int = 5, w: int = 4,
                       min_shared: int = 2) -> DataFrame:
    """(id_a, id_b, n_shared): candidate clone pairs — docs sharing at
    least ``min_shared`` distinct winnowing fingerprints (each shared
    fingerprint witnesses a shared token run; >= 2 rules out single-gram
    coincidences).  The pair join is an equi-join on the fingerprint value
    — O(matching fingerprints), never an all-pairs product — followed by
    one map-side-combined count; skewed fingerprints (megaboilerplate) are
    AQE skew-join territory exactly like the dedup band joins."""
    fps = (winnow_fingerprints(df, id_col, text_col, k=k, w=w)
           .select("id", "fp").distinct())
    a = fps.select(F.col("id").alias("id_a"), "fp")
    b = fps.select(F.col("id").alias("id_b"), "fp")
    return (a.join(b, "fp")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
            .where(F.col("n_shared") >= int(min_shared))
            .orderBy("id_a", "id_b"))
