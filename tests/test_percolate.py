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
