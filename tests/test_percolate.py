"""Percolator (reverse search) vs the pure-Python oracle's match sets on
the synthetic corpus — every classic query kind as a registered query."""

import pytest

from lucene_plugin_spark.corpus import generate_rows
from lucene_plugin_spark.oracle import OracleEngine
from lucene_plugin_spark.query.percolate import percolate

QUERIES = [
    ("q_term", "index"),
    ("q_and", "parse AND token"),
    ("q_or", "cache merge"),
    ("q_not", "index -merge"),
    ("q_phrase", '"get user"'),
    ("q_slop", '"get user"~2'),
    ("q_range", "[se TO st]"),
    ("q_wild", "ind*"),
    ("q_fuzzy", "indx~1"),
    ("q_camel", "getUserName"),
    ("q_nested", "(cache merge) AND index"),
    ("q_all", "*:*"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = generate_rows(150, seed=21)
    df = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(rows)],
        "doc_id long, text string")
    return rows, df


def test_percolate_matches_oracle(spark, corpus):
    rows, df = corpus
    out = percolate(spark, QUERIES, df.repartition(4)).collect()
    got = {(r["doc_id"], r["query_id"]) for r in out}
    oracle = OracleEngine()
    for i, r in enumerate(rows):
        oracle.index_doc("c", str(i), {"text": r["content"]}, doc_id=i)
    want = set()
    for qid, q in QUERIES:
        if q == "*:*":  # oracle.search routes MatchAll separately
            want |= {(i, qid) for i in range(len(rows))}
            continue
        for d, _, _ in oracle.search(None, q, limit=10 ** 6):
            want.add((d, qid))
    assert got == want
    # sanity: every registered query matched something on this corpus
    assert {q for _, q in got} == {q for q, _ in QUERIES}


def test_percolate_streaming(spark, corpus, tmp_path_factory):
    # the percolator is a stateless mapInPandas — it composes with
    # Structured Streaming unchanged (the alerting deployment shape)
    import json
    import os
    rows, df = corpus
    tmp = str(tmp_path_factory.mktemp("perc-stream"))
    src = os.path.join(tmp, "in")
    df.coalesce(1).write.mode("overwrite").json(src)
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    out = percolate(spark, [("q_term", "index"), ("q_and", "parse AND token")],
                    stream)
    qy = (out.writeStream.format("memory").queryName("perc")
          .outputMode("append").trigger(availableNow=True).start())
    qy.awaitTermination(300)
    got = {(r["doc_id"], r["query_id"])
           for r in spark.table("perc").collect()}
    batch = {(r["doc_id"], r["query_id"])
             for r in percolate(spark, [("q_term", "index"),
                                        ("q_and", "parse AND token")],
                                df).collect()}
    assert got == batch and got


def test_prefilter_never_skips_a_matching_query(spark, corpus):
    # _can_match may only return False when the query truly matches nothing
    # in the batch — check the implication over every registered kind plus
    # absent-term variants, against actual evaluation on the corpus
    from lucene_plugin_spark.query.parser import parse_query
    from lucene_plugin_spark.query.percolate import _can_match

    rows, df = corpus
    from lucene_plugin_spark.analysis.tokenizer import tokenize_text
    vocab = set()
    for r in rows:
        vocab.update(t for t, _ in tokenize_text(r["content"]))
    extra = [
        ("a_term", "zzznothere"),
        ("a_phrase", '"index zzznothere"'),
        ("a_and", "index AND zzznothere"),
        ("a_or_half", "index zzznothere"),
        ("a_or_none", "qqqgone zzznothere"),
        ("a_not_ok", "index -zzznothere"),
    ]
    matched = {q for _, q in
               {(r["doc_id"], r["query_id"]) for r in
                percolate(spark, QUERIES + extra, df).collect()}}
    for qid, q in QUERIES + extra:
        node = parse_query(q)
        if not _can_match(node, vocab, "text"):
            assert qid not in matched, (qid, q)
    # and the pruning actually fires for the provably-dead registrations
    dead = {"a_term", "a_phrase", "a_and", "a_or_none"}
    for qid, q in extra:
        if qid in dead:
            assert not _can_match(parse_query(q), vocab, "text"), qid
            assert qid not in matched, qid


def test_prefilter_is_result_invariant(spark, corpus):
    # results with a registry mixing live and dead queries equal the live
    # registry's results exactly (prefilter = pure evaluation skip)
    rows, df = corpus
    dead = [("z1", "zzznothere"), ("z2", '"index zzznothere"')]
    a = {(r["doc_id"], r["query_id"])
         for r in percolate(spark, QUERIES, df).collect()}
    b = {(r["doc_id"], r["query_id"])
         for r in percolate(spark, QUERIES + dead, df).collect()}
    assert a == b
