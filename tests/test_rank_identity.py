"""Rank-identity gate (BASELINE.md (b)): engine top-k docIDs and BM25 scores
must match the pure-Python oracle on the reference query set, for BOTH
physical strategies, over the seeded synthetic code corpus."""

import numpy as np
import pytest

from lucene_plugin_spark.corpus import QUERY_SET, generate_rows
from lucene_plugin_spark.index.builder import IndexBuilder
from lucene_plugin_spark.oracle import OracleEngine
from lucene_plugin_spark.query.executor import SearchEngine
from lucene_plugin_spark.storage.catalog import Catalog

N_DOCS = 400


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    rows = generate_rows(N_DOCS, seed=42)
    catalog = Catalog(wh)
    builder = IndexBuilder(spark, catalog, docs_per_slice=100)  # force multi-slice
    src = spark.createDataFrame(rows).select("repo", "path", "commit", "lang", "content")
    builder.build(src)
    oracle = OracleEngine.from_rows(rows)
    return catalog, oracle


@pytest.mark.parametrize("mode", ["kernel", "dataframe"])
@pytest.mark.parametrize("name,query", QUERY_SET)
@pytest.mark.parametrize("k", [10, 255])
def test_rank_identity(spark, built, mode, name, query, k):
    catalog, oracle = built
    engine = SearchEngine(spark, catalog)
    got = [(r["doc_id"], r["path"], r["score"])
           for r in engine.search(None, query, limit=k, mode=mode).collect()]
    want = oracle.search(None, query, limit=k)
    assert [g[0] for g in got] == [w[0] for w in want], f"{name}: docID lists differ"
    assert [g[1] for g in got] == [w[1] for w in want]
    assert np.allclose([g[2] for g in got], [w[2] for w in want], rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("repo", ["repo-00", "repo-03"])
def test_rank_identity_collection_scoped(spark, built, repo):
    catalog, oracle = built
    engine = SearchEngine(spark, catalog)
    for mode in ("kernel", "dataframe"):
        got = [(r["doc_id"], r["score"])
               for r in engine.search(repo, "index query cache", limit=50, mode=mode).collect()]
        want = [(d, s) for d, _, s in oracle.search(repo, "index query cache", limit=50)]
        assert [g[0] for g in got] == [w[0] for w in want], mode
        assert np.allclose([g[1] for g in got], [w[1] for w in want], rtol=1e-9)


def test_kernel_vs_dataframe_identical(spark, built):
    catalog, _ = built
    engine = SearchEngine(spark, catalog)
    for _, q in QUERY_SET:
        a = [(r["doc_id"], round(r["score"], 9))
             for r in engine.search(None, q, limit=100, mode="kernel").collect()]
        b = [(r["doc_id"], round(r["score"], 9))
             for r in engine.search(None, q, limit=100, mode="dataframe").collect()]
        assert a == b, q
