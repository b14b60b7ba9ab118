"""Similarity search over embedding columns (array<float/double>).

- ``cosine_topk``: brute-force top-k neighbors — the exactness baseline.
  Dot products computed JVM-side with higher-order functions
  (``aggregate(zip_with(...))``), so the whole plan is codegen'd; the join is
  a broadcast of the (small) query set against the (huge) corpus — no
  shuffle of the corpus.
- ``ivf_topk``: the scale path — coarse quantization (IVF): corpus vectors
  are bucketed by nearest centroid; a query probes only ``nprobe`` buckets.
  Centroids come from a provided label/cluster column or from
  ``kmeans_cells`` — a deterministic seeded k-means (md5-smallest seeds +
  Lloyd iterations) — at 100 TB the centroid table is broadcast and the
  corpus scan is partition-pruned by centroid id.
- ``rp_lsh_topk``: the other scale path — random-hyperplane LSH (SimHash for
  vectors): sign-bit signatures against deterministic md5-derived
  hyperplanes, banded like MinHash; a query only scores candidates sharing
  at least one signature band.  The candidate join is an equi-join on
  (band, key) — corpus never shuffles against itself and recall is the
  standard banded-LSH bound.
- ``embedding_norms`` precomputes L2 norms once (stored with the corpus) so
  repeated queries never recompute them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from lucene_plugin_spark.ops.dedup import TOKEN_SPLIT_RE


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def embedding_norms(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("vec"),
                     _norm(F.col(vec_col)).alias("nrm"))


def cosine_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                vec_col: str, k: int = 10) -> DataFrame:
    """(query_id, id, cosine) top-k corpus neighbors per query vector.

    ``queries`` must have (query_id, vec).  Broadcast the query side; rank
    with a window partitioned by query — per-partition partial top-k then
    merge is what Catalyst's TakeOrdered does under the limit when the
    query set is 1; for many queries the window + filter shape keeps
    everything distributed.
    """
    c = embedding_norms(corpus, id_col, vec_col)
    q = queries.select(F.col("query_id"), F.col("vec").alias("qvec"),
                       _norm(F.col("vec")).alias("qnrm"))
    scored = (c.crossJoin(F.broadcast(q))
              .where(F.col("id") != F.col("query_id"))
              .select("query_id", "id",
                      (_dot(F.col("vec"), F.col("qvec"))
                       / (F.col("nrm") * F.col("qnrm"))).alias("cosine")))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k).drop("rk"))


def _assign_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(id, cell): nearest centroid by cosine, ties to the smallest cell id.
    ``centroids`` (cell, cvec) is broadcast — the corpus never shuffles."""
    from pyspark.sql import Window
    scored = (vectors.crossJoin(F.broadcast(centroids))
              .select("id", "cell",
                      (_dot(F.col("vec"), F.col("cvec"))
                       / (_norm(F.col("vec")) * _norm(F.col("cvec")))).alias("csim")))
    w = Window.partitionBy("id").orderBy(F.desc("csim"), F.asc("cell"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1).select("id", "cell"))


def kmeans_cells(corpus: DataFrame, id_col: str, vec_col: str, k: int = 8,
                 iters: int = 1) -> DataFrame:
    """Deterministic seeded k-means coarse quantizer -> (id, cell).

    Seeds: the ``k`` corpus vectors with the smallest md5(id) (order-free,
    reproducible, oracle-expressible).  Then ``iters`` Lloyd iterations:
    assign by broadcast-centroid cosine, recompute centroids as per-cell
    per-dimension means (posexplode -> groupBy(cell, dim) — Spark's map-side
    partial aggregation makes the shuffle k*dim rows, not corpus-sized).
    Centroid components are rounded to 9 decimals so assignment does not
    depend on floating-point summation order across partitions.
    """
    from lucene_plugin_spark.ops.hashing import md5_long
    spark = corpus.sparkSession
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    seeds = (c.withColumn("h", md5_long(F.col("id").cast("string")))
             .orderBy("h", "id").limit(k).select("vec").collect())
    cent = spark.createDataFrame(
        [(i, [float(x) for x in r["vec"]]) for i, r in enumerate(seeds)],
        "cell int, cvec array<double>")
    for _ in range(iters):
        asg = _assign_cells(c, cent)
        means = (asg.join(c, "id")
                 .select("cell", F.posexplode("vec").alias("i", "x"))
                 .groupBy("cell", "i").agg(F.round(F.avg("x"), 9).alias("m"))
                 .groupBy("cell")
                 .agg(F.transform(F.sort_array(F.collect_list(F.struct("i", "m"))),
                                  lambda s: s["m"]).alias("cvec")))
        cent = means
    return _assign_cells(c, cent)


def ivf_topk(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
             cluster_col: str | None = None, k: int = 10, nprobe: int = 2,
             n_cells: int = 8) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` nearest centroids only.

    ``cluster_col`` assigns each corpus vector to a coarse cell (a label, a
    k-means id, ...); when None, cells come from the deterministic seeded
    :func:`kmeans_cells` quantizer (one Lloyd iteration).  Centroids =
    per-cell mean vectors (tiny, broadcast).  At scale the corpus is
    partitioned by cell so probing prunes partitions.
    """
    if cluster_col is None:
        cells_map = kmeans_cells(corpus, id_col, vec_col, k=n_cells)
        corpus = (corpus.withColumnRenamed(id_col, "id")
                  .join(cells_map, "id")
                  .withColumnRenamed("id", id_col)
                  .withColumnRenamed("cell", "__ivf_cell__"))
        cluster_col = "__ivf_cell__"
    dim_df = corpus.select(F.size(F.col(vec_col)).alias("d")).limit(1)
    dim = dim_df.collect()[0]["d"]
    cells = corpus.select(F.col(cluster_col).alias("cell"),
                          F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cent = (cells.select("cell", *[F.col("vec")[i].alias(f"c{i}") for i in range(dim)])
            .groupBy("cell").agg(*[F.avg(f"c{i}").alias(f"c{i}") for i in range(dim)])
            .select("cell", F.array(*[f"c{i}" for i in range(dim)]).alias("cvec")))
    q = queries.select("query_id", F.col("vec").alias("qvec"),
                       _norm(F.col("vec")).alias("qnrm"))
    # nearest nprobe centroids per query (centroid table is tiny)
    qc = (q.crossJoin(F.broadcast(cent))
          .select("query_id", "cell",
                  (_dot(F.col("qvec"), F.col("cvec"))
                   / (F.col("qnrm") * _norm(F.col("cvec")))).alias("csim")))
    from pyspark.sql import Window
    wq = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cell"))
    probe = (qc.withColumn("rk", F.row_number().over(wq))
             .where(F.col("rk") <= nprobe).select("query_id", "cell"))
    cand = cells.join(probe.hint("broadcast"), "cell")
    scored = (cand.join(F.broadcast(q), "query_id")
              .where(F.col("id") != F.col("query_id"))
              .select("query_id", "id",
                      (_dot(F.col("vec"), F.col("qvec"))
                       / (_norm(F.col("vec")) * F.col("qnrm"))).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k).drop("rk"))


def rp_planes(dim: int, n_planes: int = 16) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, oracle-reproducible.

    Component (p, i) = md5-prefix of ``"p:i"`` mapped affinely into
    [-1, 1] — the same formula is expressible in DuckDB SQL
    (``ops.hashing.md5_long_sql``), so the Spark signatures and an oracle's
    signatures agree bit-for-bit."""
    import hashlib

    def comp(p: int, i: int) -> float:
        h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:15], 16)
        return (h % 2000001) / 1000000.0 - 1.0

    return [[comp(p, i) for i in range(dim)] for p in range(n_planes)]


def rp_signatures(df: DataFrame, id_col: str, vec_col: str,
                  n_planes: int = 16) -> DataFrame:
    """(id, vec, sig): sign-bit signature — bit p set iff dot(vec, plane_p) > 0.

    The plane table is tiny (n_planes x dim, driver-built, broadcast); dot
    products run JVM-side via higher-order functions, the bit-pack is one
    aggregate — the corpus is read once, no shuffle."""
    spark = df.sparkSession
    dim = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()[0]["d"]
    planes = spark.createDataFrame(
        [(p, v) for p, v in enumerate(rp_planes(dim, n_planes))],
        "p int, hvec array<double>")
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    bits = (base.crossJoin(F.broadcast(planes))
            .select("id", "vec", "p",
                    (_dot(F.col("vec"), F.col("hvec")) > 0).cast("long").alias("bit")))
    return (bits.groupBy("id")
            .agg(F.first("vec").alias("vec"),
                 F.sum(F.expr("shiftleft(bit, p)")).alias("sig")))


def rp_lsh_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                vec_col: str, k: int = 10, n_planes: int = 16,
                bands: int = 4) -> DataFrame:
    """(query_id, id, cosine) approximate top-k via banded sign-bit LSH.

    Candidates = corpus vectors sharing at least one of ``bands`` signature
    bands with the query (equi-join on (band, key) — the LSH shape that
    survives 100 TB: the corpus shuffles once on band keys, never pairwise).
    Candidates are ranked by exact cosine; recall follows the banded-LSH
    curve (more planes per band = fewer, closer candidates).
    """
    r = n_planes // bands
    mask = (1 << r) - 1
    sc = rp_signatures(corpus, id_col, vec_col, n_planes)
    sq = (rp_signatures(queries, "query_id", "vec", n_planes)
          .withColumnRenamed("id", "query_id"))

    def banded(df, idc):
        rows = [df.select(F.col(idc), F.lit(b).alias("band"),
                          F.shiftrightunsigned(F.col("sig"), b * r)
                          .bitwiseAND(F.lit(mask)).alias("bkey"))
                for b in range(bands)]
        out = rows[0]
        for x in rows[1:]:
            out = out.unionByName(x)
        return out

    cand = (banded(sc, "id").join(banded(sq, "query_id"), ["band", "bkey"])
            .select("query_id", "id").distinct())
    c = embedding_norms(corpus, id_col, vec_col)
    q = queries.select("query_id", F.col("vec").alias("qvec"),
                       _norm(F.col("vec")).alias("qnrm"))
    scored = (cand.join(c, "id").join(F.broadcast(q), "query_id")
              .where(F.col("id") != F.col("query_id"))
              .select("query_id", "id",
                      (_dot(F.col("vec"), F.col("qvec"))
                       / (F.col("nrm") * F.col("qnrm"))).alias("cosine")))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k).drop("rk"))


def embedding_near_dup_pairs(corpus: DataFrame, id_col: str, vec_col: str,
                             threshold: float = 0.95,
                             cluster_col: str | None = None) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold — embedding-based
    near-duplicate detection for training-data dedup.

    Exact mode (``cluster_col=None``): self cross-join, every unordered pair
    compared once (id_a < id_b), dot products JVM-side.  Exact all-pairs is
    O(n²) and infeasible at 100 TB; pass ``cluster_col`` (coarse IVF cell /
    LSH bucket) to restrict candidates to same-cell pairs — the bucketed
    near-dup pipeline whose equi-join on cell shuffles each side once and
    whose recall is bounded by the bucketing (exactly like MinHash bands).
    """
    c = embedding_norms(corpus, id_col, vec_col)
    a = c.select(F.col("id").alias("id_a"), F.col("vec").alias("va"),
                 F.col("nrm").alias("na"))
    b = c.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"),
                 F.col("nrm").alias("nb"))
    if cluster_col is not None:
        cells = corpus.select(F.col(id_col).alias("id"),
                              F.col(cluster_col).alias("cell"))
        a = a.join(cells.withColumnRenamed("id", "id_a"), "id_a")
        b = b.join(cells.withColumnRenamed("id", "id_b"), "id_b")
        pairs = a.join(b, "cell")
    else:
        pairs = a.crossJoin(b)
    return (pairs.where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    (_dot(F.col("va"), F.col("vb"))
                     / (F.col("na") * F.col("nb"))).alias("cosine"))
            .where(F.col("cosine") >= F.lit(threshold)))


# --------------------------------------------------------------------------
# sparse TF-IDF document similarity (no embeddings needed)
# --------------------------------------------------------------------------

def tfidf_pairs(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", max_df: int = 50,
                min_sim: float = 0.2, top_k: int = 50) -> DataFrame:
    """(id_a, id_b, sim) — cosine similarity over TF-IDF weighted bags of
    words, for pairs sharing at least one retained term; top-``top_k`` by
    (sim desc, id_a, id_b), id_a < id_b.

    Feature pruning: terms with df > ``max_df`` are dropped BEFORE the pair
    join — the standard sparse-similarity trick (hot terms contribute little
    idf weight but dominate the join fan-out; at 100 TB an unpruned join on
    'the' is quadratic in corpus size, pruned it is bounded by
    df² per retained term).  idf = ln(N / df) over the retained vocabulary;
    norms are computed over retained terms only, so the measure is exact
    FOR THE PRUNED FEATURE SPACE (documented contract, same in the oracle).

    Shuffles: tf groupBy, df groupBy (vocab-sized), the term equi-join, and
    the pair groupBy — all key-partitioned, no cartesian anywhere.
    """
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(F.filter(
                         F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                         lambda t: t != F.lit(""))).alias("term"))
    tf = toks.groupBy("id", "term").agg(F.count("*").cast("double").alias("tf"))
    n_docs = float(df.count())
    dfc = (tf.groupBy("term").agg(F.count("*").alias("df"))
           .where(F.col("df") <= max_df))
    w = (tf.join(dfc, "term")
         .select("id", "term",
                 (F.col("tf") * F.log(F.lit(n_docs) / F.col("df"))).alias("w")))
    norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a = w.select(F.col("id").alias("id_a"), "term", F.col("w").alias("wa"))
    b = w.select(F.col("id").alias("id_b"), "term", F.col("w").alias("wb"))
    dots = (a.join(b, "term")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot")))
    na = norms.select(F.col("id").alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("nb"))
    return (dots.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b",
                    F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
                    .alias("sim"))
            .where(F.col("sim") >= min_sim)
            .orderBy(F.desc("sim"), F.asc("id_a"), F.asc("id_b"))
            .limit(top_k))
