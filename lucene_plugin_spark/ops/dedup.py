"""Deduplication operators for large-scale training-data pipelines.

All operators take a DataFrame with (``id_col``: long, ``text_col``: string)
and are built from JVM-side built-ins (split/explode/groupBy/join) so Catalyst
pushes filters and does partial aggregation; the only Python is the simhash
bit-fold (a vectorized pandas UDF).

Scale notes: exact dedup is one hash-groupBy (map-side combined).  MinHash-LSH
is the standard shingle -> K minhashes -> band buckets -> within-bucket join
pipeline: the candidate join is an equi-join on (band, bucket-hash) — no
pairwise blow-up; skewed buckets (boilerplate docs) are handled by AQE skew
join and a configurable per-bucket cap.  N-gram Jaccard is for verifying
candidates (or small corpora): an equi-join on shingle with per-pair counts,
followed by |A∪B| = |A|+|B|-|A∩B|.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType

from lucene_plugin_spark.ops.hashing import md5_long

TOKEN_SPLIT_RE = r"[^a-zA-Z0-9]+"


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, token): lowercase, non-alphanumeric split, empties dropped."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE).alias("toks"))
    return (toks.select("id", F.posexplode("toks").alias("pos", "token"))
            .where(F.col("token") != ""))


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) distinct word n-gram shingles.

    Built with higher-order array functions (transform + slice over the token
    array) — zero shuffles until the final distinct, vs the naive pos-join
    formulation which costs n-1 self-joins.  Empty tokens from the regex
    split occur only at string boundaries (the + quantifier collapses
    interior separator runs), so filtering them before shingling yields the
    same n-grams as position-aware removal."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                 lambda x: x != "").alias("toks"))
    grams = F.when(
        F.size("toks") >= n,
        F.transform(F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice("toks", i, n)))
    ).otherwise(F.array().cast("array<string>"))
    return (toks.select("id", F.explode(grams).alias("shingle"))
            .distinct())


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by sha256(text): (content_sha256, n_dups, keep_id, dup_ids).

    keep_id = smallest id in the group (deterministic survivor)."""
    h = df.select(F.col(id_col).alias("id"),
                  F.sha2(F.col(text_col), 256).alias("content_sha256"))
    return (h.groupBy("content_sha256")
            .agg(F.count(F.lit(1)).alias("n_dups"),
                 F.min("id").alias("keep_id"),
                 F.sort_array(F.collect_list("id")).alias("ids")))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with shingle-Jaccard >= threshold.

    Equi-join on shingle -> |A∩B| per pair; sizes joined back for the union.
    Corpus-wide this join is quadratic in per-shingle document frequency —
    use it as a small-corpus baseline or a candidate VERIFIER (see
    :func:`jaccard_for_pairs`), never as the full-corpus near-dup path.
    """
    sh = shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (a.join(b, "shingle")
             .where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter")))
    out = (inter
           .join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
           .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
           .select("id_a", "id_b",
                   (F.col("inter") /
                    (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"))
           .where(F.col("jaccard") >= threshold))
    return out


def jaccard_for_pairs(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle-Jaccard for GIVEN candidate pairs only.

    ``sh``: (id, shingle) rows; ``pairs``: (id_a, id_b).  The shingle table is
    first semi-joined to the candidate ids, so the expensive shingle equi-join
    touches only candidate docs' shingles — O(candidates), independent of
    corpus size (the scale contract of the LSH->verify pipeline).  Returns
    (id_a, id_b, jaccard) for every input pair.
    """
    cand_ids = (pairs.select(F.col("id_a").alias("id"))
                .unionByName(pairs.select(F.col("id_b").alias("id")))
                .distinct())
    # candidate-scoped shingles feed three consumers (sizes + both sides of
    # the intersection join); cache the SMALL post-semi-join frame so the
    # corpus-wide shingle pass behind ``sh`` runs exactly once
    sh_c = sh.join(cand_ids, "id", "left_semi").cache()
    sizes = sh_c.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (pairs
             .join(sh_c.select(F.col("id").alias("id_a"), "shingle"), "id_a")
             .join(sh_c.select(F.col("id").alias("id_b"), "shingle"),
                   ["id_b", "shingle"])
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter")))
    return (pairs
            .join(inter, ["id_a", "id_b"], "left")
            .join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
            .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
            .select("id_a", "id_b",
                    (F.coalesce(F.col("inter"), F.lit(0)) /
                     (F.col("sz_a") + F.col("sz_b")
                      - F.coalesce(F.col("inter"), F.lit(0)))).alias("jaccard")))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3, num_hashes: int = 16,
                       sh: DataFrame | None = None) -> DataFrame:
    """(id, sig array<long>): sig[j] = min over shingles of h_j(shingle).

    One md5 per shingle, then a cheap affine mix per hash function
    (h_j = (a_j*md5 + b_j) mod p) — K minhashes cost ONE digest instead of
    K, and the family is portable to the SQL oracle.  ``sh`` accepts a
    prebuilt (id, shingle) frame so callers can share one shingle pass.

    Formulation note: a "zero-shuffle" variant that computes the whole
    signature as array higher-order functions (shingle array → md5 array →
    array_min per affine mix) was built and benchmarked in round 4 and
    REJECTED: nested HOF lambdas are evaluated interpreted (outside
    whole-stage codegen), measuring 13x slower than this explode+groupBy at
    sf0.1 (25 s vs 1.9 s), and produced nondeterministic signatures (banded
    pair counts varied run to run — buffer-reuse hazards in nested lambda
    evaluation).  The groupBy(id) here is a map-side-combined partial agg of
    K longs per doc — the shuffle carries one K-long row per document, not
    the exploded shingles, and its exchange is deduped by ReuseExchange
    across every downstream consumer."""
    from lucene_plugin_spark.ops.hashing import minhash_mix
    if sh is None:
        sh = shingles(df, id_col, text_col, n)
    sh = sh.withColumn("h0", md5_long(F.col("shingle")))
    mins = [F.min(minhash_mix(F.col("h0"), j)).alias(f"m{j}")
            for j in range(num_hashes)]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"m{j}" for j in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3, num_hashes: int = 16, bands: int = 4,
                      verify_threshold: float | None = 0.5) -> DataFrame:
    """MinHash + banded LSH candidate pairs (id_a, id_b [, jaccard]).

    ``bands`` bands of ``num_hashes/bands`` rows; candidates share at least
    one full band.  With verify_threshold set, candidates are verified with
    exact shingle Jaccard computed over the CANDIDATE docs' shingles only
    (:func:`jaccard_for_pairs`) — the standard two-stage near-dup pipeline
    with a verify stage that stays O(candidates) at any corpus size.
    """
    r = num_hashes // bands
    sh = shingles(df, id_col, text_col, n)
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes, sh=sh)
    # ONE generator projection emits all band keys (a per-branch union would
    # re-evaluate the whole signature map pass once per band AND per join
    # side — with no exchange in the lineage there is nothing for Spark's
    # ReuseExchange to dedupe).  posexplode references ``sig`` once, so the
    # expensive expression tree runs exactly once per row; the band self-join
    # then shuffles only the skinny (id, band, bkey) rows, and its two
    # identical exchange subplans collapse into one via ReuseExchange.
    keys = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat_ws(
            "_", b.cast("string"),
            F.array_join(F.transform(F.slice("sig", b * r + 1, r),
                                     lambda v: v.cast("string")), "_")))
    bandsdf = sig.select("id", F.posexplode(keys).alias("band", "bkey"))
    a = bandsdf.select(F.col("id").alias("id_a"), "band", "bkey")
    b2 = bandsdf.select(F.col("id").alias("id_b"), "band", "bkey")
    cand = (a.join(b2, ["band", "bkey"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    if verify_threshold is None:
        return cand
    # cand is tiny (candidate pairs) but feeds four joins in the verifier —
    # cache it so the band self-join runs once, not per consumer.  The
    # verify stage re-reads shingles, but only for candidate docs
    # (jaccard_for_pairs semi-joins then caches the post-filter frame), so
    # the corpus-wide ``sh`` pass is never cached here (r2 bench showed
    # materializing it costs more than recomputing the map pass).
    cand = cand.cache()
    ver = jaccard_for_pairs(sh, cand)
    return ver.where(F.col("jaccard") >= verify_threshold)


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash): 64-bit SimHash over token md5 hashes, tf-weighted.

    Bit-fold runs as ONE ``mapInPandas`` segment reduction per partition
    (ids are co-located by the repartition): each Arrow batch contributes
    per-id bit sums via ``np.add.reduceat``, partial sums accumulate across
    batches, and the fold emits once per partition — no per-document Python
    group overhead (millions of tiny applyInPandas groups would pay per-group
    serialization at billions of docs).  Token hashing stays JVM-side.
    """
    t = (_tokens(df, id_col, text_col)
         .groupBy("id", "token").agg(F.count(F.lit(1)).alias("w"))
         .withColumn("h", md5_long("token"))
         .repartition(F.col("id")))

    from typing import Iterator

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(60, dtype=np.uint64)
        acc: dict[int, np.ndarray] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy(np.int64)
            hv = pdf["h"].to_numpy(np.uint64)
            wv = pdf["w"].to_numpy(np.int64)
            order = np.argsort(ids, kind="mergesort")
            ids, hv, wv = ids[order], hv[order], wv[order]
            bits = ((hv[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            contrib = np.where(bits == 1, wv[:, None], -wv[:, None])
            starts = np.flatnonzero(np.concatenate(([True], ids[1:] != ids[:-1])))
            sums = np.add.reduceat(contrib, starts, axis=0)
            for uid, srow in zip(ids[starts], sums):
                prev = acc.get(int(uid))
                acc[int(uid)] = srow if prev is None else prev + srow
        if not acc:
            return
        uids = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
        mat = np.stack([acc[int(u)] for u in uids])
        vals = ((mat > 0).astype(np.uint64) << shifts).sum(axis=1).astype(np.int64)
        yield pd.DataFrame({"id": uids, "simhash": vals})

    return t.mapInPandas(fold, schema="id long, simhash long")


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) pairs within Hamming distance, via block LSH.

    The 60-bit simhash is split into ``max_hamming + 1`` contiguous blocks
    (pigeonhole: <= max_hamming differing bits => at least one block equal),
    candidates equi-join on (block, block-key), and exact ``bit_count(xor)``
    filters to the radius.  max_hamming=3 gives the classic 4 x 15-bit
    layout; larger radii trade narrower keys (more candidates) for the same
    recall guarantee."""
    sh = simhash64(df, id_col, text_col)
    nb = max_hamming + 1
    base, rem = divmod(60, nb)
    blocks, off = [], 0
    for b in range(nb):
        width = base + (1 if b < rem else 0)
        key = F.shiftrightunsigned(F.col("simhash"), off).bitwiseAND(F.lit((1 << width) - 1))
        off += width
        blocks.append(sh.select("id", "simhash", F.lit(b).alias("blk"), key.alias("bkey")))
    bl = blocks[0]
    for x in blocks[1:]:
        bl = bl.unionByName(x)
    a = bl.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "blk", "bkey")
    b2 = bl.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "blk", "bkey")
    cand = (a.join(b2, ["blk", "bkey"]).where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sh_a", "sh_b").distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.select("id_a", "id_b", ham.alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


# ---------------------------------------------------------------- clustering

def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in MapReduce
    and Beyond"): every strictly-larger neighbor of u re-attaches to
    m = min(N(u) ∪ {u})."""
    s = (e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
         .where(F.col("a") != F.col("b")))
    mins = (s.groupBy("a").agg(F.min("b").alias("mb"))
            .select("a", F.least("a", "mb").alias("m")))
    return (s.join(mins, "a").where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b")).distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: direct edges high->low; every smaller neighbor of
    u (and u itself) attaches to m = min of u's smaller neighborhood.
    Output edges are canonical (a > b), so successive small-star outputs
    compare directly for convergence."""
    d = (e.select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
         .where(F.col("a") != F.col("b")).distinct())
    mins = d.groupBy("a").agg(F.min("b").alias("m"))
    re_attach = (d.join(mins, "a")
                 .where(F.col("b") != F.col("m"))
                 .select(F.col("b").alias("a"), F.col("m").alias("b")))
    own = mins.select("a", F.col("m").alias("b"))
    return (re_attach.unionByName(own)
            .where(F.col("a") != F.col("b")).distinct())


def connected_components(pairs: DataFrame, nodes: DataFrame | None = None,
                         max_iter: int = 25) -> DataFrame:
    """(id, cluster_id): undirected connected components over near-dup
    pairs; cluster_id = smallest id in the component (the deterministic
    canonical representative).

    Alternating large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): each round first hangs larger
    neighbors off local minima, then contracts smaller neighborhoods onto
    their minimum — convergence in O(log² n) rounds even on adversarial
    path/chain graphs (plain min-label propagation needs rounds equal to
    the component eccentricity, i.e. O(n) on a path).  ``localCheckpoint``
    truncates the per-round join lineage; convergence = the canonical
    small-star edge set reaching a fixed point, at which point it IS the
    star (every node -> component min).

    Scale contract: every per-round shuffle touches only the PAIRS graph —
    the LSH output, orders of magnitude smaller than the corpus — never
    the corpus itself.  ``nodes`` (one id column) adds singleton
    components for docs that appear in no pair.
    """
    edges = (pairs.select(F.col(pairs.columns[0]).alias("a"),
                          F.col(pairs.columns[1]).alias("b"))
             .where(F.col("a") != F.col("b")).distinct().localCheckpoint())
    if edges.limit(1).count() == 0:
        star = edges
    else:
        star = _small_star(edges).localCheckpoint()
        for _ in range(max_iter):
            new = _small_star(_large_star(star)).localCheckpoint()
            changed = (new.exceptAll(star).limit(1).count()
                       + star.exceptAll(new).limit(1).count())
            star = new
            if changed == 0:
                break
    roots = star.select(F.col("b").alias("id")).distinct() \
        .join(star.select(F.col("a").alias("id")), "id", "left_anti")
    out = (star.select(F.col("a").alias("id"), F.col("b").alias("cluster_id"))
           .unionByName(roots.select("id", F.col("id").alias("cluster_id")))
           .groupBy("id").agg(F.min("cluster_id").alias("cluster_id")))
    if nodes is not None:
        ids = nodes.select(F.col(nodes.columns[0]).alias("id")).distinct()
        out = (ids.join(out, "id", "left")
               .select("id", F.coalesce("cluster_id", F.col("id"))
                       .alias("cluster_id")))
    return out


def near_dup_clusters(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3, num_hashes: int = 8, bands: int = 4,
                      verify_threshold: float = 0.4,
                      max_iter: int = 25) -> DataFrame:
    """End-to-end near-dup deduplication: MinHash-LSH candidates ->
    exact-Jaccard verify -> connected components -> canonical survivor.

    Returns one row per input doc: (id, cluster_id, kept) where kept means
    this doc is its cluster's representative (min id) — the row a
    training-data pipeline streams into the output corpus; ``kept=false``
    rows are the dropped duplicates, preserved with their cluster for
    audit/lineage."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, n=n,
                              num_hashes=num_hashes, bands=bands,
                              verify_threshold=verify_threshold)
    cc = connected_components(pairs.select("id_a", "id_b"),
                              nodes=df.select(F.col(id_col).alias("id")),
                              max_iter=max_iter)
    return cc.withColumn("kept", F.col("cluster_id") == F.col("id"))


def dup_span_coverage(df: DataFrame, id_col: str, text_col: str,
                      n: int = 5, min_count: int = 2) -> DataFrame:
    """Exact duplicated-substring screening at token granularity — the
    ExactSubstr criterion of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"): a token is *duplicated* if some word
    n-gram covering it occurs at least ``min_count`` times corpus-wide
    (every positional occurrence counts, within- and cross-document).

    Returns one row per doc: (id, n_tokens, n_dup_tokens, dup_fraction) —
    the per-document duplicated-span coverage a pipeline thresholds to drop
    boilerplate-heavy documents or to cut the repeated spans themselves
    (the (id, pos) start set is ``_dup_span_starts``'s output, exposed for
    that second use).

    Scale shape: positional shingles come from array functions over each
    row (no positional self-join); the occurrence count is ONE hash-groupBy
    (map-side combined) whose output is |distinct n-grams| rows; the
    duplicated set joins back to starts by shingle equi-join (AQE
    broadcasts it when small — typically a tiny fraction of the vocabulary
    survives ``min_count``); coverage expansion is n× over *duplicated
    starts only*, and the per-(id, pos) distinct is partially aggregated
    map-side.  At 100 TB, substitute ``xxhash64(shingle)`` for the string
    on both sides of the count/join to shrink shuffle bytes (64-bit
    collisions are ~n²/2⁶⁵ — negligible vs the screening's purpose); the
    string form here keeps the operator exactly reproducible in ANSI SQL.
    """
    starts, toks = _dup_span_starts(df, id_col, text_col, n)
    dup = (starts.groupBy("shingle")
           .agg(F.count(F.lit(1)).alias("c"))
           .where(F.col("c") >= min_count)
           .select("shingle"))
    covered = (starts.join(dup, "shingle")
               .select("id", F.explode(
                   F.sequence(F.col("pos"), F.col("pos") + (n - 1)))
                   .alias("cpos"))
               .distinct())
    ndup = covered.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup"))
    return (toks.select("id", "n_tokens")
            .join(ndup, "id", "left")
            .select("id", "n_tokens",
                    F.coalesce(F.col("n_dup"), F.lit(0)).cast("bigint")
                    .alias("n_dup_tokens"),
                    F.round(F.coalesce(F.col("n_dup"), F.lit(0))
                            / F.greatest(F.col("n_tokens"), F.lit(1)), 6)
                    .alias("dup_fraction")))


def _dup_span_starts(df: DataFrame, id_col: str, text_col: str, n: int
                     ) -> tuple[DataFrame, DataFrame]:
    """(starts, toks): positional n-gram starts (id, pos, shingle) — NOT
    deduped, every occurrence is one row — plus per-doc token counts.
    Positions index the empty-filtered token array (dense)."""
    toks = (df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                 lambda x: x != "").alias("toks"))
        .select("id", "toks", F.size("toks").cast("bigint").alias("n_tokens")))
    grams = F.when(
        F.col("n_tokens") >= n,
        F.transform(F.sequence(F.lit(1), (F.col("n_tokens") - (n - 1)).cast("int")),
                    lambda i: F.struct(
                        (i - 1).cast("int").alias("pos"),
                        F.concat_ws(" ", F.slice("toks", i, n)).alias("shingle")))
    ).otherwise(F.array().cast("array<struct<pos:int,shingle:string>>"))
    starts = (toks.select("id", F.explode(grams).alias("s"))
              .select("id", F.col("s.pos").alias("pos"),
                      F.col("s.shingle").alias("shingle")))
    return starts, toks
