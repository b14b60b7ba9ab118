"""Document classification over corpus statistics — the lucene-classification
module family (shipped in the 5.2 line the reference embeds:
``SimpleNaiveBayesClassifier`` and ``KNearestNeighborClassifier`` classify a
document from the statistics an ``IndexReader`` already holds; here the same
statistics come straight off the tokenized corpus with DataFrame built-ins).

Both classifiers emit FLOAT-FREE output (id, predicted class) — predictions
are argmaxes over scores whose margins dwarf double noise, and the returned
columns are integers/strings, so results hash identically across engines.

Scale notes: naive Bayes is two corpus map passes + one (vocab x classes)
aggregate; the per-(doc, class) score grid joins the doc's tokens to a
class-count table on ``term`` (postings-shaped equi-join) and the class
dimension is broadcast.  The kNN classifier takes its candidates from the
SimHash pigeonhole block join (``ops/dedup.simhash_near_pairs``) — lossless
for the Hamming radius — so no all-pairs product ever forms; radius trades
candidate volume for recall exactly like the dedup path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def naive_bayes_classify(df: DataFrame, id_col: str, text_col: str,
                         class_col: str) -> DataFrame:
    """(id, pred): argmax_c of a df-based multinomial naive Bayes.

    Model (the ``SimpleNaiveBayesClassifier`` shape — per-class DOCUMENT
    frequencies, not term frequencies, drive the likelihood, like Lucene's
    ``getWordFreqForClass`` hit counts):

        score(d, c) = ln(nd_c / N)
                    + Σ_{w ∈ distinct tokens of d} ln((df_{w,c} + 1)
                                                      / (tot_c + V))

    with ``df_{w,c}`` = docs of class c containing w, ``tot_c`` = Σ_w
    df_{w,c}, ``V`` = corpus vocabulary size (add-one smoothing over the
    vocabulary — documented deviation from Lucene's avg-unique-terms
    denominator heuristic, same argmax family).  The Σ over a doc's tokens
    only needs the PRESENT (w, c) pairs: missing pairs contribute the
    constant smoothing floor, so

        Σ = Σ_present ln(df_{w,c} + 1) - n_tok(d) · ln(tot_c + V)

    which keeps the join inner (postings-shaped) instead of a left join
    against the full vocabulary.  Ties break on class name ascending.
    """
    from lucene_plugin_spark.ops.dedup import _tokens
    base = df.select(F.col(id_col).alias("id"),
                     F.col(text_col).alias("text"),
                     F.col(class_col).alias("cls"))
    tok = (_tokens(base, "id", "text").select("id", "token").distinct())
    tokc = tok.join(base.select("id", "cls"), "id")
    # per-class model tables: priors, per-(term, class) doc freq, df mass
    priors = base.groupBy("cls").agg(
        F.count(F.lit(1)).cast("double").alias("nd"))
    n_total = base.select(
        F.count(F.lit(1)).cast("double").alias("n_total"))
    dfc = tokc.groupBy("token", "cls").agg(
        F.count(F.lit(1)).cast("double").alias("dfw"))
    totc = dfc.groupBy("cls").agg(F.sum("dfw").alias("tot"))
    vocab = tok.select("token").distinct().select(
        F.count(F.lit(1)).cast("double").alias("v"))
    ntok = tok.groupBy("id").agg(
        F.count(F.lit(1)).cast("double").alias("nt"))
    # present-pair mass per (doc, class): one postings-shaped equi-join
    pres = (tok.join(dfc, "token")
            .groupBy("id", "cls")
            .agg(F.sum(F.log(F.col("dfw") + 1.0)).alias("s_pres")))
    # (doc x class) grid: the class dimension is tiny — broadcast
    consts = (priors.join(totc, "cls")
              .crossJoin(F.broadcast(n_total))
              .crossJoin(F.broadcast(vocab)))
    grid = ntok.crossJoin(F.broadcast(consts))
    score = (F.log(F.col("nd") / F.col("n_total"))
             + F.coalesce(F.col("s_pres"), F.lit(0.0))
             - F.col("nt") * F.log(F.col("tot") + F.col("v")))
    scored = (grid.join(pres, ["id", "cls"], "left")
              .select("id", "cls", score.alias("score")))
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("cls"))
    return (scored.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select("id", F.col("cls").alias("pred")))


def knn_classify_simhash(df: DataFrame, id_col: str, text_col: str,
                         class_col: str, k: int = 5,
                         max_hamming: int = 11) -> DataFrame:
    """(id, pred): majority class of the ≤ ``k`` nearest neighbours within
    SimHash Hamming radius ``max_hamming`` — the
    ``KNearestNeighborClassifier`` shape with the neighbour search mapped to
    the bit-sampling LSH the dedup path already uses.

    Neighbour order is (hamming ASC, neighbour id ASC); the vote breaks
    ties on (count DESC, class ASC).  Docs with no neighbour inside the
    radius are dropped (no prediction) — the radius is the recall/cost
    knob, NOT an approximation: the pigeonhole block join is lossless for
    ≤ ``max_hamming`` differing bits.  Everything is integer arithmetic,
    so predictions are exactly reproducible across engines and runs.
    """
    from lucene_plugin_spark.ops.dedup import simhash_near_pairs
    base = df.select(F.col(id_col).alias("id"),
                     F.col(text_col).alias("text"),
                     F.col(class_col).alias("cls"))
    pairs = simhash_near_pairs(base, "id", "text", max_hamming=max_hamming)
    sym = (pairs.select(F.col("id_a").alias("id"),
                        F.col("id_b").alias("nb"), "hamming")
           .unionByName(pairs.select(F.col("id_b").alias("id"),
                                     F.col("id_a").alias("nb"), "hamming")))
    wnn = Window.partitionBy("id").orderBy(F.asc("hamming"), F.asc("nb"))
    topk = (sym.withColumn("_r", F.row_number().over(wnn))
            .where(F.col("_r") <= int(k)))
    votes = (topk.join(base.select(F.col("id").alias("nb"),
                                   F.col("cls").alias("nb_cls")), "nb")
             .groupBy("id", "nb_cls")
             .agg(F.count(F.lit(1)).alias("n")))
    wv = Window.partitionBy("id").orderBy(F.desc("n"), F.asc("nb_cls"))
    return (votes.withColumn("_r", F.row_number().over(wv))
            .where(F.col("_r") == 1)
            .select("id", F.col("nb_cls").alias("pred")))
