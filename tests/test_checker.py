"""Index integrity checker (Lucene CheckIndex analogue, storage/checker.py):
healthy indexes pass, mutated-but-consistent indexes pass, and injected
corruption in block metadata is detected."""

import pyspark.sql.functions as F
import pytest

from lucene_plugin_spark.corpus import generate_rows
from lucene_plugin_spark.index.builder import IndexBuilder
from lucene_plugin_spark.storage.catalog import Catalog
from lucene_plugin_spark.storage.checker import check_index


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("chk"))
    rows = generate_rows(300, seed=42)
    catalog = Catalog(wh)
    builder = IndexBuilder(spark, catalog, docs_per_slice=64)
    builder.build(spark.createDataFrame(rows)
                  .select("repo", "path", "commit", "lang", "content"))
    return catalog, builder


def test_clean_index_passes(spark, built):
    catalog, _ = built
    rep = check_index(spark, catalog)
    assert rep["errors"] == []
    assert rep["slices"] >= 4 and rep["terms"] > 0 and rep["postings"] > 0


def test_post_mutation_index_passes(spark, built):
    from lucene_plugin_spark.index.mutations import IndexMutator
    catalog, builder = built
    mut = IndexMutator(spark, catalog, builder)
    upd = spark.createDataFrame(
        [("repo-01", "src/f000017.py", "c2", "py", "totally new words here")],
        "repo string, path string, commit string, lang string, content string")
    mut.upsert(upd)
    mut.delete_keys(spark.createDataFrame([("repo-02", "src/f000010.java")],
                                          "repo string, path string"))
    rep = check_index(spark, catalog)
    assert rep["errors"] == []


def test_corrupted_block_max_detected(spark, built):
    catalog, _ = built
    seg = catalog.table("segments").read(spark)
    # understate one hot term's block_max_tf: WAND could then skip docs it
    # must score — exactly the class of corruption the checker exists for
    bad = seg.withColumn(
        "block_max_tf",
        F.when((F.col("term") == "get") & (F.col("block_max_tf") > 1),
               F.lit(1)).otherwise(F.col("block_max_tf")))
    catalog.table("segments").overwrite(bad, partition_by=["dslice"])
    try:
        rep = check_index(spark, catalog)
        assert any("block_max_tf" in e for e in rep["errors"]), rep["errors"]
    finally:
        catalog.table("segments").overwrite(seg, partition_by=["dslice"])
        assert check_index(spark, catalog)["errors"] == []
