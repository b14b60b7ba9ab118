"""Mergeable distinct-count sketch (KMV / k-minimum-values, bottom-k).

``approx_count_distinct`` (HyperLogLog++) is the built-in answer but its
estimate depends on an opaque register layout — not reproducible in an
external oracle.  KMV is the deterministic alternative: keep the k smallest
md5 values of the distinct elements; with v_k = k-th smallest hash mapped
into (0,1], the estimator (k-1)/v_k is the classic bottom-k sketch
(Bar-Yossef et al.), exact below k, relative error ~1/sqrt(k-2) above.

Determinism makes it oracle-checkable AND mergeable with exact semantics:
merge(A, B) = k smallest of (sketch(A) ∪ sketch(B)) — the union/rollup
property a 100 TB pipeline needs (per-partition sketches combine without
rescanning; pytest pins merge(sketch(A), sketch(B)) == sketch(A ∪ B)).

Scale shape: one distinct on (group, hash) (map-side combined), one
shuffle on group for the bottom-k window — state per group is k longs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from lucene_plugin_spark.ops.hashing import md5_long

#: md5_long hash space: 15 hex digits = 60 bits
HASH_SPACE = float(1 << 60)


def kmv_sketch(df: DataFrame, group_col: str, value_col: str,
               k: int = 64) -> DataFrame:
    """(group, ks: array<long>) — the k smallest distinct-value hashes."""
    d = (df.select(F.col(group_col).alias("grp"),
                   md5_long(F.col(value_col).cast("string")).alias("h"))
         .distinct())
    w = Window.partitionBy("grp").orderBy("h")
    return (d.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .groupBy("grp")
            .agg(F.sort_array(F.collect_list("h")).alias("ks")))


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Merge two sketch frames: per group, k smallest of the union."""
    u = (a.unionByName(b)
         .select("grp", F.explode("ks").alias("h"))
         .distinct())
    w = Window.partitionBy("grp").orderBy("h")
    return (u.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .groupBy("grp")
            .agg(F.sort_array(F.collect_list("h")).alias("ks")))


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """(grp, n_distinct_est: double): exact when the group has < k distinct
    values (the sketch holds them all), else (k-1)/v_k with v_k normalized
    into (0,1] — computed with the same expression shape the SQL oracle
    uses, so the doubles agree bit-for-bit."""
    n_kept = F.size("ks")
    v_k = F.element_at("ks", k).cast("double") / F.lit(HASH_SPACE)
    est = F.when(n_kept < k, n_kept.cast("double")) \
        .otherwise(F.lit(float(k - 1)) / v_k)
    return sketch.select("grp", F.round(est, 4).alias("n_distinct_est"))


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64) -> DataFrame:
    """(grp, n_distinct_est) in one call: sketch + estimate."""
    return kmv_estimate(kmv_sketch(df, group_col, value_col, k), k)
