"""Invariants from input_hint / north rule: per-row sha256 content equality,
deterministic docIDs, build determinism, checkpoint-resume."""

import hashlib

import pyspark.sql.functions as F
import pytest

from lucene_plugin_spark.corpus import generate_rows
from lucene_plugin_spark.index.builder import IndexBuilder
from lucene_plugin_spark.storage.catalog import Catalog


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh-inv"))
    rows = generate_rows(200, seed=7)
    catalog = Catalog(wh)
    builder = IndexBuilder(spark, catalog, docs_per_slice=64)
    src = spark.createDataFrame(rows).select("repo", "path", "commit", "lang", "content")
    builder.build(src)
    return catalog, builder, rows


def test_sha256_per_row_equality(spark, built):
    """Engine docs table content hashes == hashes of the source rows."""
    catalog, _, rows = built
    want = {(r["repo"], r["path"]): hashlib.sha256(r["content"].encode()).hexdigest()
            for r in rows}
    got = {(r["repo"], r["path"]): r["content_sha256"]
           for r in catalog.table("docs").read(spark)
           .select("repo", "path", "content_sha256").collect()}
    assert got == want


def test_doc_ids_dense_and_sorted(spark, built):
    catalog, _, rows = built
    meta = (catalog.table("docs_meta").read(spark)
            .select("doc_id", "repo", "path").orderBy("doc_id").collect())
    assert [m["doc_id"] for m in meta] == list(range(len(rows)))
    keys = [(m["repo"], m["path"]) for m in meta]
    assert keys == sorted(keys)


def test_term_dict_matches_flat(spark, built):
    catalog, builder, _ = built
    flat = builder.flat_view()
    td = catalog.table("term_dict").read(spark)
    recomputed = flat.groupBy("field", "term").agg(
        F.count(F.lit(1)).alias("df2"), F.sum("tf").alias("cf2"))
    diff = (td.join(recomputed, ["field", "term"], "full")
            .where((F.col("df") != F.col("df2")) | (F.col("cf") != F.col("cf2"))
                   | F.col("df").isNull() | F.col("df2").isNull()))
    assert diff.count() == 0


def test_segments_cover_flat_postings(spark, built):
    """Total postings in compressed segments == rows in the derived flat view
    (segments are the ONLY durable postings store; flat is decoded on demand)."""
    catalog, builder, _ = built
    from lucene_plugin_spark.index.fused import NORMS_TERM
    seg_total = (catalog.table("segments").read(spark)
                 .where(F.col("term") != NORMS_TERM)
                 .agg(F.sum("doc_count")).collect()[0][0])
    flat_total = builder.flat_view().count()
    assert seg_total == flat_total
    # and no flat-postings table is materialized on disk at all
    assert not catalog.table("postings_flat").exists()


def test_build_is_resumable_and_idempotent(spark, built):
    """Re-running build_from_docs with the same docs snapshot must skip every
    stage (fingerprint match) and leave snapshots unchanged (checkpoint-resume,
    north rule)."""
    catalog, builder, _ = built
    before = {t: catalog.table(t).current_snapshot_id()
              for t in ("docs_meta", "term_dict", "stats",
                        "field_lens", "doc_norms", "segments")}
    builder.build_from_docs()  # resume: all fingerprints match
    after = {t: catalog.table(t).current_snapshot_id() for t in before}
    assert before == after


def test_resume_from_partial_build(spark, tmp_path_factory):
    """Kill after an early stage; resume completes the remaining stages and
    the final state equals a from-scratch build."""
    rows = generate_rows(120, seed=11)
    src = lambda: spark.createDataFrame(rows).select("repo", "path", "commit", "lang", "content")

    wh1 = str(tmp_path_factory.mktemp("wh-partial"))
    c1 = Catalog(wh1)
    b1 = IndexBuilder(spark, c1, docs_per_slice=64)
    docs_snap = b1.ingest_docs(src())
    # simulate crash: run only docs_meta stage by building then deleting later tables
    b1.build_from_docs(docs_snap)
    # wipe the segments table to simulate dying before the last stage commit
    c1.drop("segments")
    b1.build_from_docs(docs_snap)  # resume
    assert c1.table("segments").exists()

    wh2 = str(tmp_path_factory.mktemp("wh-clean"))
    c2 = Catalog(wh2)
    IndexBuilder(spark, c2, docs_per_slice=64).build(src())

    # physical block geometry may differ between a resumed and a clean build
    # (like Lucene segment geometry varying with flush timing); the invariant
    # is LOGICAL: identical decoded postings, positions included
    from lucene_plugin_spark.index import fused

    def logical(cat):
        seg = cat.table("segments").read(spark)
        flat = seg.mapInArrow(fused.decode_flat_kernel, fused.FLAT_DDL)
        rows = flat.select("field", "term", "doc_id", "tf", "dl",
                           F.col("positions").cast("string").alias("p")).collect()
        return sorted(map(tuple, rows))

    assert logical(c1) == logical(c2)


def test_deterministic_rebuild(spark, tmp_path_factory):
    """Two independent builds of the same corpus produce identical postings."""
    rows = generate_rows(100, seed=3)
    outs = []
    for name in ("d1", "d2"):
        wh = str(tmp_path_factory.mktemp(name))
        c = Catalog(wh)
        b = IndexBuilder(spark, c, docs_per_slice=64)
        b.build(spark.createDataFrame(rows).select("repo", "path", "commit", "lang", "content"))
        outs.append(sorted(map(tuple,
                               b.flat_view()
                               .select("field", "term", "doc_id", "tf").collect())))
    assert outs[0] == outs[1]


def test_sidecars_track_index_across_rebuild(spark, tmp_path_factory):
    """A rebuilt (or resumed-then-advanced) index can never pair with a
    stale expansion sidecar: spell_grams and phonetic_codes are pinned to
    the term_dict snapshot they were derived from, so the first lookup
    after term_dict moves rebuilds them and new vocabulary is visible."""
    from lucene_plugin_spark.query.executor import SearchEngine

    wh = str(tmp_path_factory.mktemp("wh-sidecar"))
    rows = generate_rows(100, seed=13)
    catalog = Catalog(wh)
    builder = IndexBuilder(spark, catalog, docs_per_slice=64)
    src = spark.createDataFrame(rows).select(
        "repo", "path", "commit", "lang", "content")
    builder.build(src)

    eng = SearchEngine(spark, catalog)
    eng.phonetic_expand = "sidecar"
    eng.phonetic_search(None, "indx", limit=10).count()   # builds sidecar
    eng._spell_grams_df().count()                         # builds sidecar
    td_sid_1 = catalog.table("term_dict").current_snapshot_id()
    for t in ("phonetic_codes", "spell_grams"):
        assert (catalog.table(t).snapshot().properties["source_term_dict"]
                == td_sid_1), t

    # advance the index: new docs with vocabulary absent from build #1
    extra = [{"repo": "r9", "path": f"zz{i}", "commit": "c", "lang": "py",
              "content": "zanzibar zanzibar quorum flotilla"}
             for i in range(3)]
    docs_snap = builder.ingest_docs(spark.createDataFrame(rows + extra)
                                    .select("repo", "path", "commit",
                                            "lang", "content"))
    builder.build_from_docs(docs_snap)
    td_sid_2 = catalog.table("term_dict").current_snapshot_id()
    assert td_sid_2 != td_sid_1

    # a FRESH engine (new reader over the advanced catalog) must not serve
    # the stale sidecars: both rebuild on first touch and carry the new
    # vocabulary
    eng2 = SearchEngine(spark, catalog)
    eng2.phonetic_expand = "sidecar"
    got = sorted(r["path"] for r in
                 eng2.phonetic_search(None, "zanzybar", limit=100).collect())
    assert got == ["zz0", "zz1", "zz2"], got
    eng2._spell_grams_df()   # spell_grams rebuilds lazily on first touch
    for t in ("phonetic_codes", "spell_grams"):
        assert (catalog.table(t).snapshot().properties["source_term_dict"]
                == td_sid_2), t
