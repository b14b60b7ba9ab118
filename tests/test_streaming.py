"""Streaming incremental indexing (W6): file-source stream -> foreachBatch
index commits; new docs become searchable after the micro-batch, bounded by
the trigger (the soft-commit visibility analogue, SURVEY.md §2.7.7)."""

import json
import os

import pytest

from lucene_plugin_spark.query.executor import SearchEngine
from lucene_plugin_spark.storage.catalog import Catalog
from lucene_plugin_spark.streaming.incremental import start_indexing_stream


def _write_batch(d, name, rows):
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_indexing_availablenow(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(src_dir, "b0.json", [
        {"repo": "s", "path": "a", "commit": "c", "lang": "t",
         "content": "streaming lamb alpha"},
        {"repo": "s", "path": "b", "commit": "c", "lang": "t",
         "content": "streaming beta"},
    ])
    schema = ("repo string, path string, commit string, lang string, "
              "content string")
    catalog = Catalog(wh)
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src_dir)
    q = start_indexing_stream(spark, catalog, stream, ckpt,
                              trigger={"availableNow": True}, docs_per_slice=64)
    q.awaitTermination(120)

    eng = SearchEngine(spark, catalog)
    hits = {r["path"] for r in eng.search("s", "streaming", limit=10).collect()}
    assert hits == {"a", "b"}

    # second wave: one update (upsert) + one new doc; restart from checkpoint
    _write_batch(src_dir, "b1.json", [
        {"repo": "s", "path": "a", "commit": "c", "lang": "t",
         "content": "updated gamma only"},
        {"repo": "s", "path": "c", "commit": "c", "lang": "t",
         "content": "streaming delta"},
    ])
    stream2 = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src_dir)
    q2 = start_indexing_stream(spark, catalog, stream2, ckpt,
                               trigger={"availableNow": True}, docs_per_slice=64)
    q2.awaitTermination(120)

    eng2 = SearchEngine(spark, catalog)
    assert {r["path"] for r in eng2.search("s", "streaming").collect()} == {"b", "c"}
    assert {r["path"] for r in eng2.search("s", "gamma").collect()} == {"a"}
    assert eng2.search("s", "alpha").count() == 0  # old terms of 'a' are gone
