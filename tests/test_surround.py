"""Surround query language (query/surround.py) — grammar vs hand trees,
strictness, and execution identity with the span/boolean machinery the
plans compile to.
"""

import numpy as np
import pytest

from lucene_plugin_spark.corpus import generate_rows
from lucene_plugin_spark.index.builder import IndexBuilder
from lucene_plugin_spark.oracle import OracleEngine
from lucene_plugin_spark.query.executor import SearchEngine
from lucene_plugin_spark.query.plan import Bool, Phrase, Term, Wildcard
from lucene_plugin_spark.query.surround import (SurroundParseError,
                                                parse_surround,
                                                surround_search)
from lucene_plugin_spark.storage.catalog import Catalog


def _t(w):
    return Term(field="text", term=w)


def test_grammar_shapes():
    assert parse_surround("foo AND bar") == Bool(must=(_t("foo"), _t("bar")))
    assert parse_surround("foo or bar") == Bool(should=(_t("foo"), _t("bar")))
    assert parse_surround("foo NOT bar") == Bool(must=(_t("foo"),),
                                                 must_not=(_t("bar"),))
    # precedence: or < and < not
    assert parse_surround("a1 or b1 and c1") == Bool(
        should=(_t("a1"), Bool(must=(_t("b1"), _t("c1")))))
    assert parse_surround("a1 and b1 not c1") == Bool(
        must=(_t("a1"), Bool(must=(_t("b1"),), must_not=(_t("c1"),))))
    # distance: prefix + infix, d -> slop d-1, N unordered / W ordered
    assert parse_surround("3n(foo, bar)") == Phrase(
        field="text", terms=("foo", "bar"), offsets=(0, 0), slop=2)
    assert parse_surround("2W(foo, bar, baz)") == Phrase(
        field="text", terms=("foo", "bar", "baz"), offsets=(0, 1, 2), slop=1)
    assert parse_surround("foo 4n bar") == parse_surround("4n(foo, bar)")
    assert parse_surround("foo 4n bar 4n baz") == Phrase(
        field="text", terms=("foo", "bar", "baz"), offsets=(0, 0, 0), slop=3)
    # prefix booleans, grouping, truncation
    assert parse_surround("AND(foo, bar)") == Bool(must=(_t("foo"),
                                                         _t("bar")))
    assert parse_surround("(foo or bar) and te*t") == Bool(
        must=(Bool(should=(_t("foo"), _t("bar"))),
              Wildcard(field="text", pattern="te*t")))


@pytest.mark.parametrize("bad", [
    "", "   ", "foo bar",              # no implicit operator
    "3n(foo)",                          # distance arity
    "foo 3n (bar or baz)",              # span operands must be terms
    "foo 2n bar 3n baz",                # mixed infix distances
    "foo and", "(foo", "not foo and",
])
def test_strict_errors(bad):
    with pytest.raises(SurroundParseError):
        parse_surround(bad)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh-surround"))
    rows = generate_rows(200, seed=7)
    catalog = Catalog(wh)
    IndexBuilder(spark, catalog, docs_per_slice=64).build(
        spark.createDataFrame(rows).select(
            "repo", "path", "commit", "lang", "content"))
    return catalog, OracleEngine.from_rows(rows)


def _got(df):
    return [(r["doc_id"], r["path"], round(r["score"], 9))
            for r in df.collect()]


def test_execution_vs_oracle(spark, built):
    catalog, oracle = built
    eng = SearchEngine(spark, catalog)
    for q in ["index AND 3n(get, user)", "index or 2w(get, user)",
              "index not cache", "and(index, query) or cache"]:
        node = parse_surround(q, variant=eng.analyzer)
        got = _got(surround_search(eng, None, q, limit=50))
        docs = list(oracle.docs.values())
        m = oracle._eval_node(node, docs)
        ranked = sorted(((s, d) for d, s in m.items()),
                        key=lambda x: (-x[0], x[1]))[:50]
        want = [(d, oracle.docs[d].path, round(s, 9)) for s, d in ranked]
        assert got, q
        assert [g[0] for g in got] == [w[0] for w in want], q
        assert np.allclose([g[2] for g in got], [w[2] for w in want]), q


def test_distance_maps_to_span_near(spark, built):
    catalog, _ = built
    eng = SearchEngine(spark, catalog)
    a = _got(surround_search(eng, None, "4n(get, user)", limit=50))
    b = _got(eng.span_near(None, "text", ["get", "user"], slop=3,
                           in_order=False, limit=50))
    assert a == b and a
    c = _got(surround_search(eng, None, "4w(get, user)", limit=50))
    d = _got(eng.span_near(None, "text", ["get", "user"], slop=3,
                           in_order=True, limit=50))
    assert c == d and c
