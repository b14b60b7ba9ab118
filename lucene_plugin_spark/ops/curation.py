"""Training-data curation operators: benchmark decontamination and PII
screening.

Both are standard pre-training pipeline stages (the reference engine has no
counterpart — these extend the engine per the brief's training-data-pipeline
requirement, like ops/dedup.py and ops/textstats.py).

Scale notes (100 TB):

- ``decontaminate`` shingles the corpus map-only (higher-order array
  functions, per-doc ``array_distinct`` — no corpus-wide distinct shuffle),
  broadcasts the *eval-set* shingles (eval sets are 10^3-10^6 examples, i.e.
  MBs — always the broadcast side), and the only shuffle is the final
  ``groupBy(doc)`` over the *matched* shingles, which is tiny after the
  broadcast semi-join.  The corpus never shuffles.
- ``pii_screen`` is a pure map pass: JVM ``regexp_extract_all`` /
  ``regexp_replace`` / ``sha2`` inside whole-stage codegen.  Zero shuffles,
  zero Python.

Regex patterns are kept to the Java∩RE2 common dialect (no lookarounds, no
backrefs) so the exact same pattern strings run in Spark (Java regex) and the
DuckDB oracle (RE2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from lucene_plugin_spark.ops.dedup import TOKEN_SPLIT_RE

# PII detector patterns — shared verbatim by the Spark path, the DuckDB
# oracle SQL, and the tests.  Java and RE2 agree on every construct used
# (character classes, bounded repeats, \b ASCII word boundary).
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def _distinct_shingles(df: DataFrame, id_col: str, text_col: str,
                       n: int) -> DataFrame:
    """(id, shingle): per-doc DISTINCT word n-grams, map-only.

    Unlike :func:`lucene_plugin_spark.ops.dedup.shingles` (global
    ``.distinct()`` — one corpus-wide shuffle), dedupe happens inside the row
    via ``array_distinct`` before the explode, so the pass stays shuffle-free.
    Docs with < n tokens produce no rows (mirrors the oracle, where they have
    no n-grams)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                 lambda x: x != "").alias("toks"))
    grams = F.when(
        F.size("toks") >= n,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                        lambda i: F.concat_ws(" ", F.slice("toks", i, n))))
    ).otherwise(F.array().cast("array<string>"))
    return toks.select("id", F.explode(grams).alias("shingle"))


def decontaminate(df: DataFrame, id_col: str, text_col: str,
                  eval_df: DataFrame, eval_text_col: str,
                  n: int = 5, min_shared: int = 1) -> DataFrame:
    """Benchmark decontamination: flag corpus docs whose word ``n``-grams
    overlap the eval/benchmark set (the GPT-3/PaLM-style 13-gram screen,
    parameterized).

    Returns (id, n_shingles, n_shared, overlap_ratio, contaminated) — one row
    per corpus doc that has at least one ``n``-gram.  ``n_shared`` counts the
    doc's distinct n-grams that appear anywhere in the eval set;
    ``contaminated`` = ``n_shared >= min_shared``.
    """
    corpus_sh = _distinct_shingles(df, id_col, text_col, n)
    eval_sh = (_distinct_shingles(
        eval_df, eval_df.columns[0], eval_text_col, n)
        .select("shingle").distinct())
    shared = (corpus_sh.join(F.broadcast(eval_sh), "shingle")
              .groupBy("id").agg(F.count(F.lit(1)).alias("n_shared")))
    sizes = corpus_sh.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles"))
    return (sizes.join(shared, "id", "left")
            .select("id", "n_shingles",
                    F.coalesce("n_shared", F.lit(0)).alias("n_shared"))
            .withColumn("overlap_ratio",
                        F.round(F.col("n_shared") / F.col("n_shingles"), 6))
            .withColumn("contaminated",
                        F.col("n_shared") >= F.lit(min_shared)))


def pii_screen(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII detection + redaction: (id, n_emails, n_ipv4, n_phones, n_pii,
    redacted_sha256).

    Detectors are deliberately high-precision/ASCII (email, dotted-quad IPv4,
    NNN-NNN-NNNN phone); redaction replaces matches with typed placeholder
    tokens in detector order (email -> ip -> phone), and the sha256 of the
    redacted text is returned so redaction itself is oracle-checkable."""
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
            IPV4_RE, "<IP>"),
        PHONE_RE, "<PHONE>")
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    n_ipv4 = F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
    return df.select(
        F.col(id_col).alias("id"),
        n_emails.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_phones.alias("n_phones"),
        (n_emails + n_ipv4 + n_phones).alias("n_pii"),
        F.sha2(redacted, 256).alias("redacted_sha256"))
