"""Deterministic sampling / selection operators for training-data curation.

A 100 TB pipeline cannot use ``rand()`` sampling: Spark re-executes lost
tasks, and a nondeterministic predicate yields a DIFFERENT sample per
attempt (and per run), breaking lineage, dedup-before/after accounting and
train/test hygiene.  Everything here keys off :func:`md5_long` of a stable
row key, so the decision for a row is a pure function of (seed, key):
retry-stable, partition-independent, reproducible across cluster sizes,
and expressible 1:1 in DuckDB for the oracle gate.

All operators are single-pass JVM-side column arithmetic — no shuffle for
the Bernoulli/split forms, one skew-aware shuffle for the per-group quota.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from lucene_plugin_spark.ops.hashing import md5_long, md5_long_sql

#: hash-space denominator: md5_long is uniform on [0, 2^60); comparing
#: ``h % SAMPLE_MOD < fraction * SAMPLE_MOD`` gives a fraction-accurate,
#: integer-exact threshold both engines compute identically
SAMPLE_MOD = 1_000_000


def _bucket(key_col, seed: int):
    return md5_long(F.col(key_col).cast("string"), seed=seed) % SAMPLE_MOD


def _bucket_sql(key_expr: str, seed: int) -> str:
    return f"{md5_long_sql(f'cast({key_expr} as varchar)', seed=seed)} % {SAMPLE_MOD}"


def hash_sample(df: DataFrame, fraction: float, key_col: str = "doc_id",
                seed: int = 42) -> DataFrame:
    """Deterministic Bernoulli sample: keep row iff its seeded hash bucket
    falls below ``fraction``.  Map-only (no shuffle); the filter is plain
    column arithmetic inside whole-stage codegen, so it fuses with the scan.
    """
    return df.where(_bucket(key_col, seed) < int(fraction * SAMPLE_MOD))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      group_col: str = "lang", key_col: str = "doc_id",
                      seed: int = 42) -> DataFrame:
    """Per-group Bernoulli rates (e.g. downsample dominant languages).

    Groups absent from ``fractions`` are dropped.  The per-group threshold
    arrives via a broadcast join of a |groups|-row map — never a shuffle of
    the corpus.
    """
    spark = df.sparkSession
    m = spark.createDataFrame(
        [(g, int(f * SAMPLE_MOD)) for g, f in sorted(fractions.items())],
        f"{group_col} string, _thr int")
    return (df.join(F.broadcast(m), group_col)
            .where(_bucket(key_col, seed) < F.col("_thr"))
            .drop("_thr"))


def hash_split(df: DataFrame, weights: dict[str, float],
               key_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Deterministic train/valid/test split: adds a ``split`` column by
    cumulative hash-bucket ranges.  A row's split never changes across
    runs, retries or cluster sizes — the property ``randomSplit`` lacks.
    ``weights`` must sum to ≤ 1; any remainder falls in the last split.
    """
    b = _bucket(key_col, seed)
    expr = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(acc * SAMPLE_MOD)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def quota_topk(df: DataFrame, k: int, group_col: str = "lang",
               order_col: str = "n_chars", id_col: str = "doc_id") -> DataFrame:
    """Keep the top-``k`` rows per group by ``order_col`` (quality-quota
    selection), deterministic tie-break on ``id_col``.

    Scale shape: ``row_number`` over (group, order) is ONE hash-partition
    shuffle on the group key.  With few huge groups (languages), per-group
    data can exceed an executor — so first cut each partition to its local
    top-k with a cheap in-partition pre-aggregation (Spark's AQE handles
    residual skew); the window then ranks only ~k×partitions rows per
    group instead of the whole group.
    """
    from pyspark.sql.window import Window
    w = Window.partitionBy(group_col).orderBy(
        F.desc(order_col), F.asc(id_col))
    # local pre-cut: per (group, input-partition) top-k, removes the
    # all-rows-through-one-reducer skew before the global window
    pre = Window.partitionBy(group_col, F.spark_partition_id()).orderBy(
        F.desc(order_col), F.asc(id_col))
    cut = (df.withColumn("_pr", F.row_number().over(pre))
           .where(F.col("_pr") <= k).drop("_pr"))
    return (cut.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k).drop("_r"))


# ---------------------------------------------------------------- oracle SQL

def hash_sample_sql(fraction: float, key_expr: str = "doc_id",
                    seed: int = 42) -> str:
    """DuckDB predicate equivalent of :func:`hash_sample`'s filter."""
    return f"{_bucket_sql(key_expr, seed)} < {int(fraction * SAMPLE_MOD)}"


def temperature_sample(df: DataFrame, n_target: int, alpha: float = 0.5,
                       group_col: str = "lang", key_col: str = "doc_id",
                       seed: int = 17) -> DataFrame:
    """Temperature-resampled corpus mix: per-group quotas proportional to
    ``n_g ** alpha`` — the multilingual/data-mixing sampling rule
    (``p_g ∝ n_g^α``, α<1 upsamples the tail relative to raw frequency;
    mT5/XLM-R style), realized DETERMINISTICALLY: quota_g =
    ``min(floor(n_target · w_g / Σw), n_g)`` and the group's quota is
    filled by seeded-hash rank (hash asc, key asc) — retry-stable and
    partition-independent like every sampler here, no ``rand()``.

    Scale shape: the group-size aggregate and quota computation are a
    |groups|-row frame broadcast back onto the corpus; the in-group rank
    is ONE window shuffle on the group key (the same shape as
    :func:`quota_topk`, and the same skew note applies).
    """
    from pyspark.sql.window import Window
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    w_col = F.pow(F.col("_n").cast("double"), float(alpha))
    weights = counts.withColumn("_w", w_col)
    tot = weights.agg(F.sum("_w").alias("_tw"))
    quotas = (weights.crossJoin(F.broadcast(tot))
              .select(group_col,
                      F.least(
                          F.floor(F.lit(float(n_target)) * F.col("_w")
                                  / F.col("_tw")).cast("long"),
                          F.col("_n")).alias("_quota")))
    rk = Window.partitionBy(group_col).orderBy(
        _bucket(key_col, seed).asc(), F.asc(key_col))
    return (df.join(F.broadcast(quotas), group_col)
            .withColumn("_r", F.row_number().over(rk))
            .where(F.col("_r") <= F.col("_quota"))
            .drop("_r", "_quota"))
