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


def _word_ngrams(toks, n: int):
    """Array of space-joined word ``n``-grams of the token array ``toks``
    (empty when the doc has fewer than ``n`` tokens) — pure JVM
    higher-order functions, no Python."""
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    ).otherwise(F.array().cast("array<string>"))


def gopher_repetition(df: DataFrame, id_col: str, text_col: str,
                      top_n: int = 2, dup_n: int = 5,
                      top_thresh: float = 0.20,
                      dup_thresh: float = 0.15) -> DataFrame:
    """(id, n_chars, top2gram_char_frac, dup5gram_char_frac, dup_word_frac,
    passes_gopher): Gopher-style repetition screens (Rae et al. 2021,
    "Scaling Language Models", table A1 repetition filters), the standard
    pre-training corpus filter family, adapted to a corpus without line
    structure (word n-grams over the whitespace tokenizer):

    - ``top2gram_char_frac``: chars covered by the most frequent word
      ``top_n``-gram = max over grams of ``count * len(gram)``, / doc chars
      (Gopher rejects > 0.20 for 2-grams);
    - ``dup5gram_char_frac``: chars covered by all ``dup_n``-grams that
      occur more than once = Σ ``count * len(gram)`` over grams with
      count ≥ 2, / doc chars (Gopher rejects > 0.15 for 5-grams; overlaps
      counted per occurrence, so the fraction can exceed 1 on degenerate
      repetition — it is a screening signal, not a measure);
    - ``dup_word_frac``: 1 − distinct/total words (word-level repetition);
    - ``passes_gopher``: 1 when both char fractions are under their
      thresholds (int, not bool, for cross-engine hash stability).

    Everything is split/slice/explode/groupBy built-ins — one map-side
    combined aggregation per n-gram order; no shuffle of the corpus text.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    base = df.select(F.col(id_col).alias("id"),
                     F.length(text_col).alias("n_chars"),
                     toks.alias("toks"))
    words = base.select(
        "id",
        F.size("toks").alias("n_words"),
        F.size(F.array_distinct("toks")).alias("n_distinct"))

    def _gram_cover(n: int, dup_only: bool) -> DataFrame:
        g = (base.select("id", F.explode(_word_ngrams(F.col("toks"), n))
                         .alias("gram"))
             .groupBy("id", "gram").agg(F.count(F.lit(1)).alias("c")))
        cover = (F.col("c") * F.length("gram")).alias("cover")
        if dup_only:
            return (g.where(F.col("c") >= 2).select("id", cover)
                    .groupBy("id").agg(F.sum("cover").alias("dup_cover")))
        return (g.select("id", cover)
                .groupBy("id").agg(F.max("cover").alias("top_cover")))

    top = _gram_cover(top_n, dup_only=False)
    dup = _gram_cover(dup_n, dup_only=True)
    out = (base.select("id", "n_chars")
           .join(words, "id", "left")
           .join(top, "id", "left").join(dup, "id", "left")
           .na.fill({"top_cover": 0, "dup_cover": 0}))
    top_frac = F.round(F.col("top_cover") / F.col("n_chars"), 6)
    dup_frac = F.round(F.col("dup_cover") / F.col("n_chars"), 6)
    return out.select(
        "id", F.col("n_chars").cast("bigint").alias("n_chars"),
        top_frac.alias("top2gram_char_frac"),
        dup_frac.alias("dup5gram_char_frac"),
        F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 6)
         .alias("dup_word_frac"),
        ((top_frac <= top_thresh) & (dup_frac <= dup_thresh))
        .cast("int").alias("passes_gopher"))


def token_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, entropy): per-document unigram Shannon entropy
    H = −Σ p(t)·ln p(t) over the whitespace tokens — the cheap
    perplexity proxy used to screen degenerate/repetitive text before
    training (low entropy = repetitive, high = diverse).  One map-side
    combined groupBy per doc; all JVM built-ins."""
    t = _tokens(df, id_col, text_col)
    per_tok = t.groupBy("id", "token").agg(F.count(F.lit(1)).alias("c"))
    # H = −Σ (c/n)·ln(c/n) = ln(n) − (Σ c·ln c)/n  — one aggregation, no join
    agg = per_tok.groupBy("id").agg(
        F.sum("c").alias("n_tokens"),
        F.sum(F.col("c") * F.log("c")).alias("clnc"))
    return agg.select(
        "id", F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.log("n_tokens") - F.col("clnc") / F.col("n_tokens"), 6)
         .alias("entropy"))


def normalize_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, norm_text, norm_sha, norm_len): CCNet-style text normalization
    (Wenzek et al. 2019 — the dedup key used before hashing paragraphs):
    lowercase → non-[a-z0-9 space] runs to a space → every digit to ``0``
    → collapse whitespace → trim.  ``norm_sha`` is the normalization-
    invariant dedup key (sha256 of the normalized text); grouping on it is
    exact dedup modulo case/punctuation/digit noise.  All JVM built-ins.
    """
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.regexp_replace(
        F.lower(F.col(text_col)),
        "[^a-z0-9 ]+", " "), "[0-9]", "0"), " +", " "))
    return df.select(
        F.col(id_col).alias("id"),
        norm.alias("norm_text"),
        F.sha2(norm, 256).alias("norm_sha"),
        F.length(norm).cast("bigint").alias("norm_len"))


def bigram_cross_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_bigrams, xent): per-document cross-entropy under the corpus
    bigram MLE model — the CCNet/KenLM perplexity-filter shape (Wenzek et
    al. 2019) with the LM trained on the corpus itself, so the operator is
    deterministic and needs no external model.

    ``P(w2|w1) = c(w1 w2) / c(w1 ·)`` counted over the whole corpus
    (``c(w1 ·)`` = occurrences of w1 *as a bigram head*, so probabilities
    sum to 1 per context); ``xent = −mean ln P`` over the doc's bigrams.
    Docs with fewer than 2 tokens have no bigrams and drop out.

    Scale shape: bigrams come from ``zip_with`` over each row's token array
    (no positional self-join), the model is two map-side-combined grouped
    counts whose output is |distinct bigrams| / |vocab| rows — not corpus
    rows — and the scoring join is plan-chosen (AQE broadcasts the model
    when it fits, shuffle-joins on w1/w2 otherwise).  Two passes over the
    corpus total, no driver-side state.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                 lambda x: x != "").alias("toks"))
    pairs = F.when(
        F.size("toks") >= 2,
        F.zip_with(F.slice("toks", 1, F.size("toks") - 1),
                   F.slice("toks", 2, F.size("toks") - 1),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    ).otherwise(F.array())
    bg = (toks.select("id", F.explode(pairs).alias("p"))
          .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")))
    model_b = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    model_u = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    scored = (bg.join(model_b, ["w1", "w2"]).join(model_u, ["w1"])
              .select("id", (F.log("cb") - F.log("cu")).alias("lnp")))
    return (scored.groupBy("id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                 F.round(-F.avg("lnp"), 6).alias("xent")))


def free_text_suggest(df: DataFrame, id_col: str, text_col: str,
                      context: str, prefix: str = "", limit: int = 10,
                      alpha: float = 0.4) -> DataFrame:
    """(token, score): next-token suggestions after ``context`` under the
    corpus bigram model with STUPID BACKOFF — the ``FreeTextSuggester``
    shape (lucene-suggest builds an n-gram FST from the analyzed corpus and
    scores continuations with Brants et al.'s stupid backoff, ALPHA=0.4;
    ours is the bigram instance over the same zip_with corpus model
    :func:`bigram_cross_entropy` trains).

    Candidates and scores:

    - tokens ``w`` with a ``(context, w)`` bigram score the MLE
      ``c(context, w) / c(context ·)``;
    - when ``prefix`` is non-empty, tokens starting with ``prefix`` that
      never follow ``context`` back off to ``alpha * c(w) / T`` (unigram
      mass, ``T`` = total tokens) — exactly the suggester's lower-order
      path.  With an empty prefix the backoff set is the whole vocabulary,
      so it is only generated when a prefix bounds it.

    Ranking: score desc, token asc.  Scale shape: the bigram/unigram
    models are two map-side-combined grouped counts (|distinct bigrams| /
    |vocab| rows); the context filter prunes the bigram model to one head
    before any ordering, so the sort ranks |continuations| rows, not the
    model.
    """
    ctx = context.lower()
    toks = df.select(
        F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                 lambda x: x != "").alias("toks"))
    pairs = F.when(
        F.size("toks") >= 2,
        F.zip_with(F.slice("toks", 1, F.size("toks") - 1),
                   F.slice("toks", 2, F.size("toks") - 1),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    ).otherwise(F.array())
    bg = (toks.select(F.explode(pairs).alias("p"))
          .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")))
    cont = (bg.where(F.col("w1") == ctx)
            .groupBy("w2").agg(F.count(F.lit(1)).alias("cb")))
    # BOTH model scalars (context head mass + total token count) from ONE
    # corpus pass — per-row higher-order counts, one aggregate job
    heads_in_row = F.size(F.filter(
        pairs, lambda p: p["w1"] == F.lit(ctx)))
    stats = toks.select(F.size("toks").alias("n"),
                        heads_in_row.alias("h")) \
        .agg(F.sum("n").alias("total"), F.sum("h").alias("head")) \
        .collect()[0]
    head = int(stats["head"] or 0)
    total = int(stats["total"] or 0)
    if prefix:
        cont = cont.where(F.col("w2").startswith(prefix.lower()))
    if head == 0:
        scored = None
    else:
        scored = cont.select(F.col("w2").alias("token"),
                             (F.col("cb") / F.lit(float(head))).alias("score"))
    if prefix:
        uni = (toks.select(F.explode("toks").alias("token"))
               .where(F.col("token").startswith(prefix.lower())))
        backoff = (uni.groupBy("token")
                   .agg(F.count(F.lit(1)).alias("cu"))
                   .join(cont.select(F.col("w2").alias("token")),
                         "token", "left_anti")
                   .select("token",
                           (F.lit(float(alpha)) * F.col("cu")
                            / F.lit(float(total))).alias("score")))
        scored = backoff if scored is None else scored.unionByName(backoff)
    if scored is None:
        return df.sparkSession.createDataFrame(
            [], "token string, score double")
    return (scored.orderBy(F.desc("score"), F.asc("token"))
            .limit(int(limit))
            .select("token", F.round("score", 6).alias("score")))


def pack_sequences(df: DataFrame, id_col: str, text_col: str,
                   group_col: str, budget: int = 512) -> DataFrame:
    """(id, group, n_tokens, seq_id): greedy contiguous sequence packing —
    the pretraining batch-construction step that lays documents head-to-tail
    into fixed token budgets.  Within each group (shard), docs in id order
    concatenate and ``seq_id`` is the budget-window a doc STARTS in (docs may
    straddle a boundary — concatenation-mode packing, the norm for LM
    pretraining, not best-fit bin packing).

    Deterministic: ordering is (group, id), token counts are the whitespace
    tokenizer's.  Scale shape: ONE running-sum window per group partition —
    groups are the parallelism unit exactly as a sharded packer runs at
    100 TB; there is no global ordering and no driver-side state.  Skewed
    groups are the caller's sharding choice (split a giant shard upstream).
    """
    from pyspark.sql import Window
    t = df.select(
        F.col(id_col).alias("id"), F.col(group_col).alias("group"),
        F.size(F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                        lambda x: x != "")).cast("bigint").alias("n_tokens"))
    w = (Window.partitionBy("group").orderBy("id")
         .rowsBetween(Window.unboundedPreceding, 0))
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return t.select("id", "group", "n_tokens",
                    F.floor(start / budget).cast("bigint").alias("seq_id"))
