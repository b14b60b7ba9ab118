"""Incremental mutation machinery (W2-W4 + W7 compaction): results after
upsert/delete/clear/compact must equal a from-scratch build of the effective
doc set (hit sets and per-doc scores; tie order may differ because surviving
docIDs differ)."""

import numpy as np
import pytest

from lucene_plugin_spark.corpus import generate_rows
from lucene_plugin_spark.index.builder import IndexBuilder
from lucene_plugin_spark.index.mutations import IndexMutator
from lucene_plugin_spark.oracle import OracleEngine
from lucene_plugin_spark.query.executor import SearchEngine
from lucene_plugin_spark.storage.catalog import Catalog

QUERIES = ["index", "get user", "parse AND token", '"user name"', "cache -merge"]


def _src(spark, rows):
    return spark.createDataFrame(rows).select("repo", "path", "commit", "lang", "content")


def _hits_by_path(spark, catalog, q, mode="kernel"):
    eng = SearchEngine(spark, catalog)
    return {r["path"]: round(r["score"], 9)
            for r in eng.search(None, q, limit=500, mode=mode).collect()}


def _oracle_hits(rows, q):
    o = OracleEngine.from_rows(rows)
    return {p: round(s, 9) for _, p, s in o.search(None, q, limit=500)}


@pytest.fixture(scope="module")
def mutated(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh-mut"))
    rows = generate_rows(150, seed=5)
    catalog = Catalog(wh)
    builder = IndexBuilder(spark, catalog, docs_per_slice=64)
    builder.build(_src(spark, rows))
    mut = IndexMutator(spark, catalog, builder)

    # upsert: modify 10 docs, add 5 new
    modified = []
    eff = {(r["repo"], r["path"]): dict(r) for r in rows}
    for i in range(0, 30, 3):
        r = dict(rows[i])
        r["content"] = r["content"] + " freshMarkerToken extra content"
        modified.append(r)
        eff[(r["repo"], r["path"])] = r
    for i in range(5):
        r = {"repo": "repo-new", "path": f"new/n{i}.py", "commit": "c0ffee42",
             "lang": "py", "content": f"brand new doc number{i} freshMarkerToken index cache"}
        modified.append(r)
        eff[(r["repo"], r["path"])] = r
    mut.upsert(_src(spark, modified))

    # delete 7 docs + clear one repo
    dels = [rows[i] for i in range(40, 61, 3)]
    for r in dels:
        mut.delete(r["repo"], r["path"])
        eff.pop((r["repo"], r["path"]), None)
    mut.clear("repo-07")
    eff = {k: v for k, v in eff.items() if k[0] != "repo-07"}
    return catalog, builder, mut, list(eff.values())


@pytest.mark.parametrize("q", QUERIES + ["freshMarkerToken", "fresh marker token"])
@pytest.mark.parametrize("mode", ["kernel", "dataframe"])
def test_mutated_index_matches_fresh_semantics(spark, mutated, q, mode):
    catalog, _, _, effective = mutated
    got = _hits_by_path(spark, catalog, q, mode)
    want = _oracle_hits(effective, q)
    assert set(got) == set(want), q
    for p in want:
        assert np.isclose(got[p], want[p], rtol=1e-9), (q, p, got[p], want[p])


def test_collection_scoped_after_mutation(spark, mutated):
    catalog, _, _, effective = mutated
    eng = SearchEngine(spark, catalog)
    got = {r["path"]: round(r["score"], 9)
           for r in eng.search("repo-new", "freshMarkerToken", limit=50).collect()}
    o = OracleEngine.from_rows(effective)
    want = {p: round(s, 9) for _, p, s in o.search("repo-new", "freshMarkerToken", limit=50)}
    assert got == want


def test_cleared_repo_is_empty(spark, mutated):
    catalog, _, _, _ = mutated
    eng = SearchEngine(spark, catalog)
    assert eng.search("repo-07", "index", limit=10).count() == 0


def test_compaction_preserves_results(spark, mutated):
    catalog, builder, mut, effective = mutated
    before = {q: _hits_by_path(spark, catalog, q) for q in QUERIES}
    mut.compact()
    # tombstones of every compacted slice reclaimed (partition-level drop)
    assert catalog.table("tombstones").read(spark).count() == 0
    after = {q: _hits_by_path(spark, catalog, q) for q in QUERIES}
    assert before == after
    # still matches oracle
    got = _hits_by_path(spark, catalog, "freshMarkerToken")
    want = _oracle_hits(effective, "freshMarkerToken")
    assert set(got) == set(want)


def _live_files(catalog, table):
    import os
    out = set()
    for e in catalog.table(table).snapshot().data_dirs:
        p = e if isinstance(e, str) else e["path"]
        for root, _, fs in os.walk(p):
            for f in fs:
                if f.endswith(".parquet"):
                    out.add(os.path.join(root, f))
    return out


def test_mutations_rewrite_O_of_k_not_O_of_N(spark, tmp_path_factory):
    """Scale contract: an upsert of k docs must leave every untouched docs
    bucket's files byte-identical (partition-scoped copy-on-write), append —
    never rewrite — segment files, and compaction must swap only dirty
    doc-slices."""
    import pyspark.sql.functions as F
    wh = str(tmp_path_factory.mktemp("wh-okn"))
    rows = generate_rows(120, seed=9)
    catalog = Catalog(wh)
    builder = IndexBuilder(spark, catalog, docs_per_slice=32)
    builder.build(_src(spark, rows))
    mut = IndexMutator(spark, catalog, builder)

    docs_before = _live_files(catalog, "docs")
    seg_before = _live_files(catalog, "segments")

    # upsert two existing docs
    upd = [dict(rows[i], content=rows[i]["content"] + " swapped") for i in (4, 40)]
    mut.upsert(_src(spark, upd))

    affected = {(r["repo"], r["kb"]) for r in
                _src(spark, upd)
                .withColumn("kb", builder.key_bucket(F.col("repo"), F.col("path")))
                .select("repo", "kb").collect()}
    docs_after = _live_files(catalog, "docs")
    removed = docs_before - docs_after
    # every file dropped from the live set belongs to an affected bucket
    for f in removed:
        assert any(f"repo={r}/kb={b}" in f for r, b in affected), f
    # untouched buckets' files are carried forward byte-identically (paths)
    untouched = {f for f in docs_before
                 if not any(f"repo={r}/kb={b}" in f for r, b in affected)}
    assert untouched <= docs_after
    assert len(untouched) > 0  # the test corpus spans many buckets

    # segments: pure append — every pre-existing file still live
    seg_after = _live_files(catalog, "segments")
    assert seg_before <= seg_after

    # compaction: only the dirty slices (the two upserted docs' old slices)
    # are replaced; clean slices' files survive verbatim
    dirty = mut.compact()
    meta = catalog.table("docs_meta").read(spark)
    all_slices = {int(r["dslice"]) for r in meta.select("dslice").distinct().collect()}
    assert set(dirty) < all_slices
    seg_final = _live_files(catalog, "segments")
    clean_files = {f for f in seg_after
                   if not any(f"dslice={d}/" in f for d in dirty)}
    assert clean_files <= seg_final
    replaced = seg_after - seg_final
    for f in replaced:
        assert any(f"dslice={d}/" in f for d in dirty), f
    # and the tombstones of those slices are reclaimed
    assert catalog.table("tombstones").read(spark).count() == 0
