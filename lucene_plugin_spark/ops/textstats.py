"""Text analysis operators: quality scoring, token counting, language-ID
heuristic, document fingerprinting.  All JVM-side built-ins (split / explode /
aggregate / windows) — no Python in the hot path; everything here is
oracle-checkable in ANSI SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from lucene_plugin_spark.analysis.stopwords import ENGLISH_STOP_WORDS
from lucene_plugin_spark.ops.dedup import TOKEN_SPLIT_RE, _tokens
from lucene_plugin_spark.ops.hashing import md5_long


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, ws_tokens, subword_tokens):
    whitespace token count + a BPE-ish subword count (alpha runs + digit runs,
    i.e. how a byte-level BPE would lower-bound segment the text)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")).alias("ws_tokens"),
        F.size(F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                        lambda x: x != "")).alias("subword_tokens"))


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_unique, stopword_ratio, mean_token_len, quality):
    the standard cheap quality screen (length, lexical diversity, stopword
    density) used to filter web/corpus text before training."""
    t = _tokens(df, id_col, text_col)
    stops = sorted(ENGLISH_STOP_WORDS)
    agg = t.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_unique"),
        F.avg(F.col("token").isin(stops).cast("double")).alias("stopword_ratio"),
        F.avg(F.length("token")).alias("mean_token_len"))
    return agg.select(
        "id", "n_tokens", "n_unique",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("mean_token_len", 6).alias("mean_token_len"),
        F.round(
            (F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
             + (F.col("n_unique") / F.col("n_tokens")) * 0.4
             + (1.0 - F.abs(F.col("stopword_ratio") - 0.04) * 5.0) * 0.2), 6
        ).alias("quality"))


def lang_id_heuristic(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, stop_en_ratio, ascii_ratio, lang_guess): n-gram-free heuristic —
    English stopword density + ASCII ratio.  (A real model would be a char
    n-gram profile; the deterministic heuristic keeps the operator
    oracle-checkable and is the standard first-pass filter shape.)"""
    t = _tokens(df, id_col, text_col)
    stops = sorted(ENGLISH_STOP_WORDS)
    agg = t.groupBy("id").agg(
        F.avg(F.col("token").isin(stops).cast("double")).alias("stop_en_ratio"))
    ascii_ratio = (F.length(F.regexp_replace(F.col(text_col), r"[^\x00-\x7F]", ""))
                   / F.greatest(F.length(F.col(text_col)), F.lit(1)))
    base = df.select(F.col(id_col).alias("id"), F.round(ascii_ratio, 6).alias("ascii_ratio"))
    return (base.join(agg, "id", "left")
            .na.fill({"stop_en_ratio": 0.0})
            .select("id", F.round("stop_en_ratio", 6).alias("stop_en_ratio"),
                    "ascii_ratio",
                    F.when((F.col("stop_en_ratio") >= 0.02) & (F.col("ascii_ratio") >= 0.99),
                           F.lit("en")).otherwise(F.lit("other")).alias("lang_guess")))


def fingerprints(df: DataFrame, id_col: str, text_col: str, n: int = 5) -> DataFrame:
    """(id, fingerprint): winnowing-style document fingerprint = min hash over
    all word n-gram shingles (rolling-hash document signature)."""
    from lucene_plugin_spark.ops.dedup import shingles
    sh = shingles(df, id_col, text_col, n)
    return (sh.withColumn("h", md5_long("shingle"))
            .groupBy("id").agg(F.min("h").alias("fingerprint")))
