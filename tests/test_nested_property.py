"""Property test: random nested boolean plans — engine (driver fast path +
a distributed-kernel sample) vs the pure-Python oracle's recursive
``_eval_node``.

Plans are generated from a seeded RNG over the synthetic corpus vocabulary:
Bool nodes with random SHOULD/MUST/MUST_NOT/FILTER children and
minimumNumberShouldMatch, DisMax nodes with random tie, Term/Phrase/Range
leaves, depth <= 3.  Catches combine-logic mistakes (mm counting, FILTER
scoring, score propagation through nesting) that fixed-query tests miss.
"""

import random

import numpy as np
import pytest

from lucene_plugin_spark.corpus import generate_rows
from lucene_plugin_spark.index.builder import IndexBuilder
from lucene_plugin_spark.oracle import OracleEngine
from lucene_plugin_spark.query.plan import Bool, DisMax, Phrase, Range, Term
from lucene_plugin_spark.query.executor import SearchEngine
from lucene_plugin_spark.storage.catalog import Catalog

N_DOCS = 200
N_PLANS = 40


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    rows = generate_rows(N_DOCS, seed=5)
    catalog = Catalog(wh)
    IndexBuilder(spark, catalog, docs_per_slice=48).build(
        spark.createDataFrame(rows).select(
            "repo", "path", "commit", "lang", "content"))
    oracle = OracleEngine.from_rows(rows)
    # vocabulary from the ANALYZED oracle tokens, frequency-sorted so random
    # terms actually hit
    from collections import Counter
    cnt = Counter(t for d in oracle.docs.values()
                  for t, _ in d.tokens.get("text", []))
    vocab = [w for w, c in cnt.most_common(60) if c >= 3]
    # adjacent pairs for phrases
    pairs = set()
    for d in list(oracle.docs.values())[:50]:
        toks = d.tokens.get("text", [])
        for (t1, p1), (t2, p2) in zip(toks, toks[1:]):
            if p2 == p1 + 1:
                pairs.add((t1, t2))
    return catalog, oracle, vocab, sorted(pairs)[:40]


def _rand_leaf(rng, vocab, pairs):
    r = rng.random()
    if r < 0.70 or not pairs:
        return Term(field="text", term=rng.choice(vocab),
                    boost=rng.choice([1.0, 1.0, 2.0]))
    if r < 0.85:
        t1, t2 = rng.choice(pairs)
        return Phrase(field="text", terms=(t1, t2), offsets=(0, 1),
                      slop=rng.choice([0, 0, 1]))
    lo = rng.choice("abcdefgijklmnpqrstu")
    return Range(field="text", lo=lo, hi=lo + "zzz")


def _rand_node(rng, vocab, pairs, depth):
    if depth <= 0 or rng.random() < 0.4:
        return _rand_leaf(rng, vocab, pairs)
    if rng.random() < 0.15:
        return DisMax(
            disjuncts=tuple(_rand_node(rng, vocab, pairs, depth - 1)
                            for _ in range(rng.randint(2, 3))),
            tie=rng.choice([0.0, 0.1, 0.5]))
    n_sh = rng.randint(0, 3)
    n_mu = rng.randint(0, 2)
    if n_sh + n_mu == 0:
        n_sh = 2
    kids = lambda n: tuple(_rand_node(rng, vocab, pairs, depth - 1)  # noqa: E731
                           for _ in range(n))
    return Bool(
        should=kids(n_sh),
        must=kids(n_mu),
        must_not=kids(rng.randint(0, 1)),
        filter=kids(1 if rng.random() < 0.2 else 0),
        min_should=(rng.randint(2, 3) if (n_sh >= 2 and rng.random() < 0.25)
                    else 0))


def _oracle_ranked(oracle, node, limit):
    hits = oracle._eval_node(node, list(oracle.docs.values()))
    ranked = sorted(((s, d) for d, s in hits.items()),
                    key=lambda x: (-x[0], x[1]))[:limit]
    return [(d, round(s, 9)) for s, d in ranked]


def test_random_nested_plans(spark, built):
    catalog, oracle, vocab, pairs = built
    eng = SearchEngine(spark, catalog).warm(collect_paths=True)
    rng = random.Random(1234)
    nonempty = 0
    for i in range(N_PLANS):
        node = _rand_node(rng, vocab, pairs, depth=3)
        got = [(r["doc_id"], round(r["score"], 9))
               for r in eng.search_node(node, None, limit=100).collect()]
        want = _oracle_ranked(oracle, node, 100)
        assert [g[0] for g in got] == [w[0] for w in want], (i, node)
        assert np.allclose([g[1] for g in got], [w[1] for w in want],
                           rtol=1e-9, atol=1e-12), (i, node)
        nonempty += bool(got)
    assert nonempty >= N_PLANS // 3, "plan generator too sparse to test much"


def test_random_nested_plans_distributed(spark, built):
    """A sample of random plans through the forced distributed kernel."""
    catalog, oracle, vocab, pairs = built
    eng = SearchEngine(spark, catalog)
    eng.driver_exec_max_postings = -1
    rng = random.Random(99)
    for _ in range(6):
        node = _rand_node(rng, vocab, pairs, depth=2)
        got = [(r["doc_id"], round(r["score"], 9))
               for r in eng.search_node(node, None, limit=100).collect()]
        want = _oracle_ranked(oracle, node, 100)
        assert got == want, node
