"""Training-data pipeline operators: dedup, similarity, text stats,
multimodal plumbing (brief requirements beyond the reference surface)."""

import numpy as np
import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),          # near dup
        (3, "completely different text about spark and indexes"),
        (4, "another unrelated document discussing benchmarks"),
        (5, "the quick brown fox jumps over the lazy dog today"),    # near dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    from lucene_plugin_spark.ops.dedup import exact_duplicates
    out = {r["keep_id"]: r["n_dups"] for r in
           exact_duplicates(docs, "doc_id", "text").collect()}
    assert out[0] == 2      # docs 0 and 1 identical, keep_id = min = 0
    assert out[2] == 1


def test_ngram_jaccard(spark, docs):
    from lucene_plugin_spark.ops.dedup import ngram_jaccard_pairs
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 3) not in pairs
    assert any(p in pairs for p in [(0, 2), (0, 5)])


def test_minhash_lsh_finds_exact_and_near(spark, docs):
    from lucene_plugin_spark.ops.dedup import minhash_lsh_pairs
    cand = {(r["id_a"], r["id_b"]) for r in
            minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_hashes=16,
                              bands=8, verify_threshold=None).collect()}
    assert (0, 1) in cand  # identical signatures always collide


def test_simhash_near_pairs(spark, docs):
    from lucene_plugin_spark.ops.dedup import simhash64, simhash_near_pairs
    sh = {r["id"]: r["simhash"] for r in simhash64(docs, "doc_id", "text").collect()}
    assert sh[0] == sh[1]
    ham = bin(sh[0] ^ sh[2]).count("1")
    assert ham < bin(sh[0] ^ sh[3]).count("1")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_near_pairs(docs, "doc_id", "text", max_hamming=10).collect()}
    assert pairs[(0, 1)] == 0


def test_cosine_topk_exact(spark):
    from lucene_plugin_spark.ops.similarity import cosine_topk
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(50, 8))
    vecs[7] = vecs[3] * 2.0  # same direction as 3 -> cosine 1.0
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)], "id long, vec array<double>")
    qs = spark.createDataFrame([(3, [float(x) for x in vecs[3]])],
                               "query_id long, vec array<double>")
    out = cosine_topk(corpus, qs, "id", "vec", k=3).collect()
    assert out[0]["id"] == 7 and abs(out[0]["cosine"] - 1.0) < 1e-12
    # numpy oracle for the full top-3
    sims = vecs @ vecs[3] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[3]))
    sims[3] = -np.inf
    want = list(np.argsort(-sims)[:3])
    assert [r["id"] for r in out] == want


def test_ivf_recalls_within_probed_cells(spark):
    from lucene_plugin_spark.ops.similarity import ivf_topk
    rng = np.random.default_rng(1)
    centers = rng.normal(size=(4, 8)) * 10
    rows = []
    for i in range(200):
        c = i % 4
        rows.append((i, [float(x) for x in centers[c] + rng.normal(size=8)], c))
    corpus = spark.createDataFrame(rows, "id long, vec array<double>, label int")
    qs = spark.createDataFrame([(0, rows[0][1])], "query_id long, vec array<double>")
    out = ivf_topk(corpus, qs, "id", "vec", "label", k=5, nprobe=1).collect()
    assert len(out) == 5
    assert all(r["id"] % 4 == 0 for r in out)  # all from the query's cell


def test_quality_and_counts(spark, docs):
    from lucene_plugin_spark.ops.textstats import quality_scores, token_counts
    q = {r["id"]: r for r in quality_scores(docs, "doc_id", "text").collect()}
    assert q[0]["n_tokens"] == 9
    assert q[0]["n_unique"] == 8  # 'the' twice
    assert abs(q[0]["stopword_ratio"] - 2 / 9) < 1e-6
    t = {r["id"]: r for r in token_counts(docs, "doc_id", "text").collect()}
    assert t[0]["ws_tokens"] == 9
    assert t[0]["subword_tokens"] == 9


def test_fingerprint_deterministic(spark, docs):
    from lucene_plugin_spark.ops.textstats import fingerprints
    a = {r["id"]: r["fingerprint"] for r in fingerprints(docs, "doc_id", "text").collect()}
    b = {r["id"]: r["fingerprint"] for r in fingerprints(docs, "doc_id", "text").collect()}
    assert a == b
    assert a[0] == a[1]  # identical docs -> identical fingerprints
    assert a[0] != a[3]


def test_multimodal_pipeline(spark):
    from lucene_plugin_spark.ops.multimodal import (extract_features,
                                                    frame_sample_plan,
                                                    synthetic_media)
    media = synthetic_media(spark, n=30, real=False)
    feats = extract_features(media, fake=True).collect()
    assert len(feats) == 30
    f0 = feats[0]
    assert f0["n_bytes"] == f0["feat_dim"] > 0
    assert 0.0 <= f0["mean_byte"] <= 255.0
    plan = frame_sample_plan(media, every_ms=1000)
    per_video = plan.groupBy("media_id").count().collect()
    assert all(r["count"] == 6 for r in per_video)  # 0..5000 step 1000


def test_multimodal_resize_and_frames(spark):
    from lucene_plugin_spark.ops.multimodal import (resize_images,
                                                    sample_frames,
                                                    synthetic_media)
    media = synthetic_media(spark, n=30, real=False)
    resized = resize_images(media, width=8, height=4).collect()
    assert len(resized) == 10  # kinds cycle image/audio/video
    assert all(r["n_bytes"] == 8 * 4 for r in resized)
    # deterministic: same input -> same resized payload
    again = {r["media_id"]: bytes(r["payload"])
             for r in resize_images(media, width=8, height=4).collect()}
    assert all(bytes(r["payload"]) == again[r["media_id"]] for r in resized)
    frames = sample_frames(media, every_ms=1000).collect()
    vids = {r["media_id"] for r in frames}
    assert len(frames) == len(vids) * 6  # 0..5000 step 1000
    by_key = {(r["media_id"], r["frame_ts_ms"]): r["frame_sha256"] for r in frames}
    # distinct timestamps of one video sample different frame slices
    mid = next(iter(vids))
    assert by_key[(mid, 0)] != by_key[(mid, 5000)]


def test_multimodal_decode_stub_raises_without_fake(spark):
    from lucene_plugin_spark.ops.multimodal import extract_features, synthetic_media
    media = synthetic_media(spark, n=3, real=False)
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        extract_features(media, fake=False).collect()


def test_embedding_near_dup_pairs(spark):
    from lucene_plugin_spark.ops.similarity import embedding_near_dup_pairs
    rng = np.random.default_rng(7)
    base = rng.normal(size=8)
    rows = [
        (0, [float(x) for x in base], 0),
        (1, [float(x) for x in base * 2.0], 0),             # same direction
        (2, [float(x) for x in base + rng.normal(size=8) * 0.05], 0),  # near dup
        (3, [float(x) for x in rng.normal(size=8)], 0),     # unrelated
        (4, [float(x) for x in base], 1),                   # dup but other cell
    ]
    df = spark.createDataFrame(rows, "id long, vec array<double>, cell int")
    # exact mode finds all near pairs regardless of cell
    exact = {(r["id_a"], r["id_b"]): r["cosine"] for r in
             embedding_near_dup_pairs(df, "id", "vec", threshold=0.95).collect()}
    assert round(exact[(0, 1)], 9) == 1.0
    assert (0, 2) in exact and (0, 3) not in exact
    assert (0, 4) in exact
    # bucketed mode only compares within a cell (the ANN-bucketed scale path)
    bucketed = {(r["id_a"], r["id_b"]) for r in
                embedding_near_dup_pairs(df, "id", "vec", threshold=0.95,
                                         cluster_col="cell").collect()}
    assert (0, 1) in bucketed and (0, 4) not in bucketed


def test_rp_lsh_topk_finds_near_neighbors(spark):
    from lucene_plugin_spark.ops import similarity as S
    rows = [(0, [1.0, 0.05, 0.0, 0.02]),
            (1, [0.98, 0.08, 0.01, 0.0]),   # near id0
            (2, [0.0, 1.0, 0.03, 0.0]),     # orthogonal-ish
            (3, [0.01, 0.0, 1.0, 0.05]),
            (4, [-1.0, -0.02, 0.0, -0.01])]  # antipodal to id0
    corpus = spark.createDataFrame(rows, "id long, vec array<double>")
    qs = spark.createDataFrame([(100, [1.0, 0.06, 0.0, 0.01])],
                               "query_id long, vec array<double>")
    got = [(r["id"], round(r["cosine"], 3)) for r in
           S.rp_lsh_topk(corpus, qs, "id", "vec", k=2, n_planes=16, bands=4)
           .orderBy(F.desc("cosine")).collect()]
    # the query's signature equals id0/id1's on most bands; the antipodal
    # vector flips every sign bit and shares no band
    assert [i for i, _ in got] == [0, 1]
    assert got[0][1] > 0.99
    assert 4 not in {i for i, _ in got}


def test_sliding_counts_overlap(spark):
    from lucene_plugin_spark.ops import windows as W
    import pyspark.sql.functions as F
    rows = [(1, 7, "view", "2024-01-01 10:10:00", 1.0),
            (2, 7, "view", "2024-01-01 10:40:00", 2.0)]
    ev = (spark.createDataFrame(rows, "event_id long, user_id long, "
                                "event_type string, ts string, value double")
          .withColumn("ts", F.to_timestamp("ts")))
    out = {(r["window_start"], r["n_events"], r["sum_value"])
           for r in W.sliding_counts(ev).collect()}
    base = 1704103200  # 2024-01-01 10:00:00 UTC
    # 10:10 -> windows starting 09:30, 10:00; 10:40 -> 10:00, 10:30
    assert out == {(base - 1800, 1, 1.0), (base, 2, 3.0), (base + 1800, 1, 2.0)}


def test_jaccard_for_pairs_matches_full(spark):
    """Candidate-scoped Jaccard == corpus-wide Jaccard on the same pairs."""
    from lucene_plugin_spark.ops import dedup as D
    import pyspark.sql.functions as F
    rows = [(0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over a lazy dog"),
            (2, "completely different text with other words entirely"),
            (3, "the quick brown fox jumps over the lazy dog")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in D.ngram_jaccard_pairs(df, "doc_id", "text", n=3,
                                           threshold=0.0).collect()}
    sh = D.shingles(df, "doc_id", "text", 3)
    pairs = spark.createDataFrame([(0, 1), (0, 3), (1, 2)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
           for r in D.jaccard_for_pairs(sh, pairs).collect()}
    assert got[(0, 3)] == 1.0
    assert got[(0, 1)] == full[(0, 1)]
    assert got[(1, 2)] == full.get((1, 2), 0.0)  # zero-overlap pair -> 0.0


def test_simhash_near_pairs_finds_near_dupes(spark):
    from lucene_plugin_spark.ops import dedup as D
    rows = [(0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappax"),
            (2, "one two three four five six seven eight nine ten")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in
           D.simhash_near_pairs(df, "doc_id", "text", max_hamming=12).collect()}
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_asof_join_basic_and_tolerance(spark):
    from lucene_plugin_spark.ops.joins import asof_join
    import pyspark.sql.functions as F
    left = (spark.createDataFrame(
        [(1, 7, "2024-01-01 10:00:30"), (2, 7, "2024-01-01 10:02:00"),
         (3, 8, "2024-01-01 10:00:00"), (4, 9, "2024-01-01 10:01:00")],
        "event_id long, user_id long, ts string")
        .withColumn("ts", F.to_timestamp("ts")))
    right = (spark.createDataFrame(
        [(100, 7, "2024-01-01 10:00:00"), (101, 7, "2024-01-01 10:01:00"),
         (102, 8, "2024-01-01 10:00:00")],
        "quote_id long, user_id long, ts string")
        .withColumn("ts", F.to_timestamp("ts")))
    got = {r["event_id"]: r["asof_quote_id"]
           for r in asof_join(left, right, "user_id", "ts", ["quote_id"]).collect()}
    # 10:00:30 -> quote at 10:00; 10:02 -> quote at 10:01; simultaneous
    # right row IS visible (<=); user 9 has no quote -> NULL
    assert got == {1: 100, 2: 101, 3: 102, 4: None}
    # tolerance: event1's match is 30s stale, event2's is 60s stale
    tol = {r["event_id"]: r["asof_quote_id"]
           for r in asof_join(left, right, "user_id", "ts", ["quote_id"],
                              tolerance="45 seconds").collect()}
    assert tol == {1: 100, 2: None, 3: 102, 4: None}
    tight = {r["event_id"]: r["asof_quote_id"]
             for r in asof_join(left, right, "user_id", "ts", ["quote_id"],
                                tolerance="20 seconds").collect()}
    assert tight == {1: None, 2: None, 3: 102, 4: None}


def test_range_join_buckets(spark):
    from lucene_plugin_spark.ops.joins import range_join
    pts = spark.createDataFrame(
        [(1, 7, 10.0), (2, 7, 95.0), (3, 8, 10.0)],
        "pid long, key long, x double")
    ivs = spark.createDataFrame(
        [(100, 7, 0.0, 50.0), (101, 7, 90.0, 200.0), (102, 8, 20.0, 30.0)],
        "iid long, key long, lo double, hi double")
    got = {(r["pid"], r["iid"]) for r in
           range_join(pts, ivs, "key", "x", "lo", "hi", bucket_width=25.0).collect()}
    assert got == {(1, 100), (2, 101)}  # (3,102) misses bounds; keys isolate


def test_kmv_sketch_exact_estimate_and_merge(spark):
    from lucene_plugin_spark.ops.sketches import (kmv_distinct, kmv_estimate,
                                                  kmv_merge, kmv_sketch)
    rows = [(("a" if i % 3 else "b"), f"u{i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, uid string")
    # k > true distinct -> exact counts
    exact = {r["grp"]: r["n_distinct_est"]
             for r in kmv_distinct(df, "grp", "uid", k=64).collect()}
    assert exact == {"a": 40.0, "b": 40.0}
    # k < distinct -> estimate within the bottom-k error envelope
    est = {r["grp"]: r["n_distinct_est"]
           for r in kmv_distinct(df, "grp", "uid", k=16).collect()}
    assert 20 <= est["a"] <= 80
    # mergeability: merge(sketch(A), sketch(B)) == sketch(A union B)
    a = df.where(df.uid.isin([f"u{i}" for i in range(20)]))
    b = df.where(~df.uid.isin([f"u{i}" for i in range(20)]))
    merged = kmv_merge(kmv_sketch(a, "grp", "uid", 16),
                       kmv_sketch(b, "grp", "uid", 16), 16)
    whole = kmv_sketch(df, "grp", "uid", 16)
    m = {r["grp"]: r["ks"] for r in merged.collect()}
    w = {r["grp"]: r["ks"] for r in whole.collect()}
    assert m == w


def test_connected_components_chain_and_singleton(spark):
    from lucene_plugin_spark.ops.dedup import connected_components
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (4, 5), (7, 9)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(1, 10)], "id long")
    got = {r["id"]: r["cluster_id"]
           for r in connected_components(pairs, nodes=nodes).collect()}
    # chain 3-4-5 must close transitively even though (3,5) is no pair
    assert got == {1: 1, 2: 1, 3: 3, 4: 3, 5: 3, 6: 6, 7: 7, 8: 8, 9: 7}


def test_connected_components_adversarial_path(spark):
    """Large-star/small-star must close a 10k-node path chain within the
    default 25-round budget (min-label propagation would need ~10k rounds
    — one per hop of eccentricity)."""
    from lucene_plugin_spark.ops.dedup import connected_components
    import pyspark.sql.functions as F
    n = 10_000
    path = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                 "id_a long, id_b long")
    cc = connected_components(path, max_iter=25)
    assert cc.count() == n
    assert cc.where(F.col("cluster_id") != 0).count() == 0


def test_connected_components_matches_union_find(spark):
    from lucene_plugin_spark.ops.dedup import connected_components
    import random
    random.seed(11)
    n = 80
    edges = [(random.randrange(n), random.randrange(n)) for _ in range(60)]
    edges = [e for e in edges if e[0] != e[1]]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for i in range(n):
        comps.setdefault(find(i), []).append(i)
    want = {x: min(mem) for mem in comps.values() for x in mem}
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {r["id"]: r["cluster_id"]
           for r in connected_components(df, nodes=nodes).collect()}
    assert got == want


def test_near_dup_clusters_end_to_end(spark, docs):
    from lucene_plugin_spark.ops.dedup import near_dup_clusters
    out = near_dup_clusters(docs, "doc_id", "text", n=3, num_hashes=8,
                            bands=4, verify_threshold=0.3).collect()
    by_id = {r["id"]: r for r in out}
    assert len(by_id) == 6                      # every doc gets a row
    # 0/1 exact dups and 5 a near dup -> one cluster kept by doc 0
    assert by_id[1]["cluster_id"] == 0 and not by_id[1]["kept"]
    assert by_id[5]["cluster_id"] == 0 and not by_id[5]["kept"]
    assert by_id[0]["kept"]
    # unrelated docs stay singleton survivors
    assert by_id[3]["cluster_id"] == 3 and by_id[3]["kept"]
    assert by_id[4]["cluster_id"] == 4 and by_id[4]["kept"]


def test_hash_sample_deterministic_and_partition_independent(spark):
    from lucene_plugin_spark.ops.sampling import hash_sample
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sorted(r["doc_id"] for r in hash_sample(df, 0.2, seed=7).collect())
    b = sorted(r["doc_id"] for r in
               hash_sample(df.repartition(13), 0.2, seed=7).collect())
    assert a == b                      # partitioning cannot change the sample
    assert abs(len(a) / 2000 - 0.2) < 0.04
    c = sorted(r["doc_id"] for r in hash_sample(df, 0.2, seed=8).collect())
    assert a != c                      # seed changes the sample


def test_hash_split_partitions_everything_once(spark):
    from lucene_plugin_spark.ops.sampling import hash_split
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, {"train": 0.8, "valid": 0.1, "test": 0.1}).collect()
    assert len(out) == 1000            # total function: every row gets a split
    frac = {s: sum(1 for r in out if r["split"] == s) / 1000
            for s in ("train", "valid", "test")}
    assert abs(frac["train"] - 0.8) < 0.05
    # stable across runs
    again = hash_split(df, {"train": 0.8, "valid": 0.1, "test": 0.1}).collect()
    assert {r["doc_id"]: r["split"] for r in out} == \
           {r["doc_id"]: r["split"] for r in again}


def test_quota_topk_matches_pandas(spark):
    import pandas as pd
    from lucene_plugin_spark.ops.sampling import quota_topk
    pdf = pd.DataFrame({
        "doc_id": range(100),
        "lang": [["en", "de", "fr"][i % 3] for i in range(100)],
        "n_chars": [(i * 37) % 50 for i in range(100)],   # plenty of ties
    })
    df = spark.createDataFrame(pdf).repartition(7)
    got = {(r["lang"], r["doc_id"])
           for r in quota_topk(df, 4, "lang", "n_chars", "doc_id").collect()}
    want = set()
    for lang, g in pdf.groupby("lang"):
        top = g.sort_values(["n_chars", "doc_id"],
                            ascending=[False, True]).head(4)
        want |= {(lang, int(i)) for i in top["doc_id"]}
    assert got == want


def test_gopher_repetition_signals(spark):
    from lucene_plugin_spark.ops.textstats import gopher_repetition
    rows = [
        (0, "a b a b"),                       # top 2-gram 'a b' x2
        (1, "one two three four five six seven eight nine ten"),
        (2, "x y z x y z x y z x y z"),       # dup 5-grams everywhere
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in
           gopher_repetition(df, "doc_id", "text").collect()}
    # doc0: n_chars=7; 2-grams 'a b'(2), 'b a'(1) -> top cover 2*3=6
    assert out[0]["n_chars"] == 7
    assert abs(out[0]["top2gram_char_frac"] - 6 / 7) < 1e-6
    assert out[0]["dup5gram_char_frac"] == 0.0      # only len-4 doc
    assert abs(out[0]["dup_word_frac"] - 0.5) < 1e-6
    assert out[0]["passes_gopher"] == 0
    # doc1: all unique words -> top 2-gram count 1, no dup 5-grams
    assert out[1]["dup5gram_char_frac"] == 0.0
    assert out[1]["dup_word_frac"] == 0.0
    assert out[1]["passes_gopher"] == 0  # top 2-gram still covers > 20%
    # doc2: heavy repetition fails both screens
    assert out[2]["dup5gram_char_frac"] > 0.15
    assert out[2]["passes_gopher"] == 0


def test_gopher_passes_clean_document(spark):
    from lucene_plugin_spark.ops.textstats import gopher_repetition
    words = " ".join(f"w{i:03d}" for i in range(60))
    df = spark.createDataFrame([(0, words)], "doc_id long, text string")
    r = gopher_repetition(df, "doc_id", "text").collect()[0]
    assert r["passes_gopher"] == 1
    assert r["dup_word_frac"] == 0.0


def test_normalize_text_key(spark):
    import hashlib
    from lucene_plugin_spark.ops.textstats import normalize_text
    rows = [(0, "  Hello,  WORLD 42!!"), (1, "hello world 42"),
            (2, "HELLO... world!! 42")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in normalize_text(df, "doc_id", "text").collect()}
    # all three normalize to the same dedup key
    assert out[0]["norm_text"] == "hello world 00"
    assert out[0]["norm_sha"] == out[1]["norm_sha"] == out[2]["norm_sha"]
    assert out[0]["norm_sha"] == hashlib.sha256(b"hello world 00").hexdigest()
    assert out[0]["norm_len"] == 14


def test_token_entropy(spark):
    import math
    from lucene_plugin_spark.ops.textstats import token_entropy
    rows = [(0, "a a a a"), (1, "a b c d"), (2, "a a b b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in token_entropy(df, "doc_id", "text").collect()}
    assert out[0]["entropy"] == 0.0                      # degenerate
    assert abs(out[1]["entropy"] - math.log(4)) < 1e-6   # uniform over 4
    assert abs(out[2]["entropy"] - math.log(2)) < 1e-6   # two 50/50 tokens
    assert out[0]["n_tokens"] == 4


def test_temperature_sample_quotas_and_determinism(spark):
    import hashlib
    import math

    from lucene_plugin_spark.ops.sampling import (SAMPLE_MOD,
                                                  temperature_sample)
    # skewed groups: en dominates, zz is tiny
    sizes = {"en": 600, "de": 150, "fr": 40, "zz": 5}
    rows, i = [], 0
    for g, n in sorted(sizes.items()):
        for _ in range(n):
            rows.append((i, g))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    n_target, alpha, seed = 200, 0.5, 17
    out = temperature_sample(df, n_target, alpha=alpha, seed=seed).collect()
    got = {}
    for r in out:
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    # exact python mirror
    w = {g: n ** alpha for g, n in sizes.items()}
    tw = sum(w.values())
    quota = {g: min(int(math.floor(n_target * w[g] / tw)), sizes[g])
             for g in sizes}
    assert {g: len(s) for g, s in got.items()} == \
           {g: q for g, q in quota.items() if q > 0}
    # alpha < 1 flattens the mix: the dominant group's SHARE shrinks,
    # the tail group's grows, vs raw-frequency sampling
    assert quota["en"] / n_target < sizes["en"] / sum(sizes.values())
    assert quota["fr"] / n_target > sizes["fr"] / sum(sizes.values())
    # selection is the seeded-hash rank, mirrored exactly
    def bucket(doc_id):
        h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:15]
        return int(h, 16) % SAMPLE_MOD
    for g in got:
        ids = [i for i, gg in rows if gg == g]
        want = set(sorted(ids, key=lambda d: (bucket(d), d))[:quota[g]])
        assert got[g] == want, g
    # partition-independent
    out2 = temperature_sample(df.repartition(13), n_target, alpha=alpha,
                              seed=seed).collect()
    assert {(r["doc_id"]) for r in out2} == {(r["doc_id"]) for r in out}
