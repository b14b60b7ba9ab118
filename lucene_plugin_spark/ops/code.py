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
