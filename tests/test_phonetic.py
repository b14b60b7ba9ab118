"""Phonetic matching (analysis/phonetic.py + SearchEngine.phonetic_search):
the American Soundex triple-twin (Python / Spark Column / DuckDB SQL) and
query-time phonetic expansion vs a brute-force class computation.
"""

import duckdb
import pytest

from lucene_plugin_spark.analysis.phonetic import (soundex, soundex_col,
                                                   soundex_sql)
from lucene_plugin_spark.analysis.tokenizer import tokenize_text
from lucene_plugin_spark.corpus import generate_rows
from lucene_plugin_spark.index.builder import IndexBuilder
from lucene_plugin_spark.query.executor import SearchEngine
from lucene_plugin_spark.storage.catalog import Catalog

#: classic reference vectors (Knuth Vol. 3 / commons-codec Soundex)
VECTORS = {
    "robert": "R163", "rupert": "R163", "ashcraft": "A261",
    "ashcroft": "A261", "tymczak": "T522", "pfister": "P236",
    "honeyman": "H555", "herman": "H655", "lloyd": "L300",
    "example": "E251", "spark": "S162", "sparc": "S162",
}


def test_reference_vectors():
    for w, code in VECTORS.items():
        assert soundex(w) == code, w
    assert soundex("123") == ""
    assert soundex("a") == "A000"


def test_three_twin_identity(spark):
    import random
    import string
    random.seed(3)
    words = ["".join(random.choices(string.ascii_lowercase + "09",
                                    k=random.randint(1, 12)))
             for _ in range(1500)]
    df = spark.createDataFrame([(w,) for w in words], "t string")
    got_spark = {r["t"]: r["sx"]
                 for r in df.select("t", soundex_col("t").alias("sx"))
                 .collect()}
    con = duckdb.connect()
    got_sql = dict(con.sql(
        "SELECT t, " + soundex_sql("regexp_replace(t, '[^a-z]', '', 'g')")
        + " FROM (SELECT unnest(" + str(words) + ") AS t)").fetchall())
    for w in words:
        want = soundex(w)
        assert got_spark[w] == want, w
        # the SQL twin leaves '' inputs to the caller's guard — skip them
        if want:
            assert got_sql[w] == want, w


def test_phonetic_search_vs_brute(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh-phon"))
    rows = generate_rows(180, seed=7)
    catalog = Catalog(wh)
    IndexBuilder(spark, catalog, docs_per_slice=64).build(
        spark.createDataFrame(rows).select(
            "repo", "path", "commit", "lang", "content"))
    eng = SearchEngine(spark, catalog)
    for q in ["indx", "quary", "cash"]:      # misspellings of corpus words
        got = sorted(r["path"] for r in
                     eng.phonetic_search(None, q, limit=100_000).collect())
        code = soundex(q)
        want = sorted(
            r["path"] for r in rows
            if any(soundex(t) == code
                   for t, _ in tokenize_text(r["content"])))
        assert got == want, q
        assert got, f"{q!r} must match for the test to mean anything"
    # scores are constant and the match is a genuine phonetic class, not
    # an exact-term lookup
    out = eng.phonetic_search(None, "indx", limit=100_000).collect()
    assert all(r["score"] == 1.0 for r in out)
    assert eng.phonetic_search(None, "12", limit=10).count() == 0
    assert eng.phonetic_search(None, "zzzzqqq", limit=10).count() == 0


def test_phonetic_sidecar_identical_to_scan(spark, tmp_path_factory):
    """The persisted (field, soundex) sidecar route returns the EXACT
    result set of the term_dict range-prune route, and the sidecar is
    rebuilt only when term_dict's snapshot moves."""
    wh = str(tmp_path_factory.mktemp("wh-phon3"))
    rows = generate_rows(150, seed=11)
    catalog = Catalog(wh)
    IndexBuilder(spark, catalog, docs_per_slice=64).build(
        spark.createDataFrame(rows).select(
            "repo", "path", "commit", "lang", "content"))
    scan = SearchEngine(spark, catalog)
    scan.phonetic_expand = "scan"
    side = SearchEngine(spark, catalog)
    side.phonetic_expand = "sidecar"
    for q in ["indx", "quary", "cash", "sparc"]:
        want = sorted((r["path"], r["score"]) for r in
                      scan.phonetic_search(None, q, limit=10_000).collect())
        got = sorted((r["path"], r["score"]) for r in
                     side.phonetic_search(None, q, limit=10_000).collect())
        assert got == want, q
        if q != "sparc":         # the misspellings are known corpus hits
            assert got, q
    # staleness: the sidecar is pinned to the term_dict snapshot it was
    # built from and reused (no rebuild) while that snapshot stands
    tbl = catalog.table("phonetic_codes")
    assert tbl.exists()
    sid_before = tbl.current_snapshot_id()
    side2 = SearchEngine(spark, catalog)
    side2.phonetic_expand = "sidecar"
    assert side2.phonetic_search(None, "indx", limit=10).count() > 0
    assert tbl.current_snapshot_id() == sid_before
    assert (tbl.snapshot().properties["source_term_dict"]
            == catalog.table("term_dict").current_snapshot_id())


def test_phonetic_matches_digit_led_terms(spark, tmp_path_factory):
    # the phonetic class is over the letters-STRIPPED term: '2sparc' codes
    # S162 like 'spark', and the sargable prune must not lose it
    wh = str(tmp_path_factory.mktemp("wh-phon2"))
    rows = [{"repo": "r", "path": f"d{i}", "commit": "c", "lang": "en",
             "content": c}
            for i, c in enumerate(["the spark engine", "token 2sparc here",
                                   "unrelated words only"])]
    catalog = Catalog(wh)
    IndexBuilder(spark, catalog, docs_per_slice=8).build(
        spark.createDataFrame(rows).select(
            "repo", "path", "commit", "lang", "content"))
    eng = SearchEngine(spark, catalog)
    got = sorted(r["path"] for r in
                 eng.phonetic_search(None, "sparc", limit=10).collect())
    assert got == ["d0", "d1"], got


def test_forced_sidecar_on_pinned_reader_never_poisons(spark,
                                                       tmp_path_factory):
    """A tag-pinned engine FORCED onto the sidecar route must not persist
    pinned-vocabulary rows under the current snapshot's stamp: the sidecar
    is always built from the exact snapshot it is stamped with, so a later
    unpinned reader sees the current vocabulary."""
    wh = str(tmp_path_factory.mktemp("wh-phon-pin"))
    catalog = Catalog(wh)
    v1 = [{"repo": "r", "path": "a", "commit": "c", "lang": "py",
           "content": "alpha words only"}]
    builder = IndexBuilder(spark, catalog, docs_per_slice=8)
    builder.build(spark.createDataFrame(v1).select(
        "repo", "path", "commit", "lang", "content"))
    pins = catalog.tag("v1")
    # advance: new doc with vocabulary absent from v1
    v2 = v1 + [{"repo": "r", "path": "b", "commit": "c", "lang": "py",
                "content": "zanzibar arrives later"}]
    snap = builder.ingest_docs(spark.createDataFrame(v2).select(
        "repo", "path", "commit", "lang", "content"))
    builder.build_from_docs(snap)

    pinned = SearchEngine(spark, catalog, pins=pins)
    pinned.phonetic_expand = "sidecar"       # forced, overriding the guard
    pinned.phonetic_search(None, "zanzybar", limit=10).count()

    fresh = SearchEngine(spark, catalog)
    fresh.phonetic_expand = "sidecar"
    got = sorted(r["path"] for r in
                 fresh.phonetic_search(None, "zanzybar", limit=10).collect())
    assert got == ["b"], got   # current vocabulary, not the pinned one
    assert (catalog.table("phonetic_codes").snapshot()
            .properties["source_term_dict"]
            == catalog.table("term_dict").current_snapshot_id())
