"""Source-code curation operators (ops/code.py) and sparse TF-IDF document
similarity (ops/similarity.py tfidf_pairs) — engine vs hand-computed
expectations on tiny deterministic corpora."""

import math

from lucene_plugin_spark.ops.code import (comment_stats, detect_license,
                                          identifier_stats)
from lucene_plugin_spark.ops.similarity import tfidf_pairs


def test_detect_license(spark):
    rows = [
        (0, "/* Permission is hereby granted, free of charge to any */ x"),
        (1, "# Licensed under the Apache License, Version 2.0 (the ..)"),
        (2, "// GNU General Public License v3\nint main(){}"),
        (3, "Redistribution and use in source and binary forms, with or"),
        (4, "def f():\n    return 1"),
        # two needles: first in LICENSE_NEEDLES order wins
        (5, "Permission is hereby granted, free of charge; also "
            "GNU General Public License"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = {r["doc_id"]: r["license"] for r in detect_license(df).collect()}
    assert got == {0: "mit", 1: "apache-2.0", 2: "gpl-3.0",
                   3: "bsd-3-clause", 4: "unknown", 5: "mit"}


def test_comment_stats(spark):
    src = "// header\n# pycomment\ncode line one\n   \n  -- sql comment\nx=1"
    df = spark.createDataFrame([(0, src)], "doc_id long, content string")
    r = comment_stats(df).collect()[0]
    assert r["n_lines"] == 6
    assert r["n_comment_lines"] == 3
    assert abs(r["comment_ratio"] - 0.5) < 1e-9
    # code sha hashes only non-comment, non-blank lines
    import hashlib
    want = hashlib.sha256("code line one\nx=1".encode()).hexdigest()
    assert r["code_sha256"] == want


def test_identifier_stats(spark):
    df = spark.createDataFrame(
        [(0, "getUserName get_user HTTPServer2 parse parse"),
         (1, "getUser userName")],
        "doc_id long, content string")
    got = {r["term"]: r["n"] for r in
           identifier_stats(df, top_k=20).collect()}
    # getUserName -> get user name; get_user -> get user; HTTPServer2 ->
    # http server2 (trailing digit glues to its word, same as the analyzer);
    # getUser -> get user; userName -> user name
    assert got["get"] == 3 and got["user"] == 4 and got["name"] == 2
    assert got["http"] == 1 and got["server2"] == 1
    assert got["parse"] == 2


def test_tfidf_pairs(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta gamma"),       # exact dup of 0 -> sim 1.0
        (2, "alpha beta delta"),
        (3, "zz yy xx"),               # shares nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r["sim"] for r in
           tfidf_pairs(df, "doc_id", "text", max_df=3, min_sim=0.01,
                       top_k=100).collect()}
    assert out[(0, 1)] == 1.0
    # hand-compute sim(0, 2): idf = ln(4/df); alpha/beta df=3, gamma df=2
    # (docs 0 and 1), delta df=1 — all weights 1*idf
    ia = math.log(4 / 3)
    dot = ia * ia * 2
    n0 = math.sqrt(2 * ia * ia + math.log(4 / 2) ** 2)
    n2 = math.sqrt(2 * ia * ia + math.log(4 / 1) ** 2)
    assert abs(out[(0, 2)] - round(dot / (n0 * n2), 6)) < 1e-6
    assert not any(3 in p for p in out)


def test_tfidf_pairs_prunes_hot_terms(spark):
    # 'common' has df 4 > max_df=3 -> pruned; docs sharing ONLY 'common'
    # never pair (the 100 TB join-fanout guard)
    rows = [(i, f"common uniq{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert tfidf_pairs(df, "doc_id", "text", max_df=3, min_sim=0.0,
                       top_k=10).count() == 0


# ------------------------------------------------------------- winnowing
def _py_winnow(text, k=5, w=4):
    """Exact Python mirror of winnow_fingerprints: md5-60bit k-gram hashes,
    rightmost-min windows, distinct (pos, fp)."""
    import hashlib
    import re

    toks = [t for t in re.split(r"[^a-zA-Z0-9]+", text.lower()) if t]
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    if not hs:
        return set()
    sel = set()
    nw = max(len(hs) - w + 1, 1)
    for s in range(nw):
        sl = hs[s:s + w]
        mn = min(sl)
        pos = s + max(i for i, h in enumerate(sl) if h == mn)
        sel.add((pos + 1, mn))          # 1-based like the engine
    return sel


def test_winnow_fingerprints_vs_python(spark):
    from lucene_plugin_spark.ops.code import winnow_fingerprints
    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely different words live in this document here now ok"),
        (3, "short doc"),                      # < k tokens -> no grams
        (4, "exactly five tokens here now"),   # 1 gram < w -> single window
        (5, "a b c d e f"),                    # 2 grams < w
    ]
    df = spark.createDataFrame(texts, "doc_id long, content string")
    got = {}
    for r in winnow_fingerprints(df, k=5, w=4).collect():
        got.setdefault(r["id"], set()).add((r["pos"], r["fp"]))
    for i, t in texts:
        want = _py_winnow(t)
        assert got.get(i, set()) == want, i
    assert 3 not in got and got[4] and got[5]
    # identical docs -> identical fingerprints (the clone guarantee)
    assert got[0] == got[1]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        winnow_fingerprints(df, k=0).collect()


def test_winnow_clone_pairs(spark):
    from lucene_plugin_spark.ops.code import winnow_clone_pairs
    boiler = ("permission is hereby granted free of charge to any person "
              "obtaining a copy of this software")
    rows = [
        (0, boiler + " alpha beta gamma delta"),
        (1, boiler + " epsilon zeta eta theta"),
        (2, "nothing in common with anybody else at all in this one text"),
        (3, boiler + " alpha beta gamma delta"),   # exact clone of 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in winnow_clone_pairs(df, min_shared=2).collect()}
    # boilerplate family pairs present, the unrelated doc in none
    assert (0, 1) in got and (0, 3) in got and (1, 3) in got
    assert not any(2 in p for p in got)
    # the exact clone shares every fingerprint; the boilerplate-only pair
    # shares strictly fewer
    assert got[(0, 3)] == len(_py_winnow(rows[0][1]) | set()) - 0 \
        or got[(0, 3)] == len({f for _, f in _py_winnow(rows[0][1])})
    assert got[(0, 1)] < got[(0, 3)]
    # brute-force count identity for every pair
    fps = {i: {f for _, f in _py_winnow(t)} for i, t in rows}
    for (a, b), n in got.items():
        assert n == len(fps[a] & fps[b]), (a, b)
