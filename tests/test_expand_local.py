"""Driver-local term-dictionary resolution (executor._term_dict_local +
expand.exp_mask): the in-process path must produce exactly the sets and
df/cf values the distributed term_dict scan produces.
"""

import random
import string

import pandas as pd
import pytest

from lucene_plugin_spark.query.expand import exp_mask, exp_match
from lucene_plugin_spark.query.plan import Fuzzy, Range, Regexp, Wildcard


def _rand_term(rng):
    n = rng.randint(1, 8)
    return "".join(rng.choice("abct*?") if rng.random() < 0.08
                   else rng.choice(string.ascii_lowercase[:6])
                   for _ in range(n))


def test_exp_mask_matches_exp_match_property():
    """exp_mask(leaf, fields, terms)[i] == exp_match(leaf, fields[i],
    terms[i]) over random leaves and random dictionaries."""
    rng = random.Random(42)
    terms = [_rand_term(rng).replace("*", "s").replace("?", "q")
             for _ in range(400)]
    fields = [rng.choice(["text", "lang"]) for _ in terms]
    fs, ts = pd.Series(fields), pd.Series(terms)
    leaves = []
    for _ in range(60):
        kind = rng.randrange(4)
        fld = rng.choice(["text", "lang"])
        if kind == 0:
            lo, hi = sorted([_rand_term(rng), _rand_term(rng)])
            leaves.append(Range(field=fld, lo=lo, hi=hi,
                                include_lo=rng.random() < .5,
                                include_hi=rng.random() < .5))
        elif kind == 1:
            leaves.append(Wildcard(field=fld, pattern=_rand_term(rng)))
        elif kind == 2:
            base = _rand_term(rng).replace("*", "").replace("?", "") or "a"
            pat = base if rng.random() < .5 else base[:1] + ".?" + base[1:]
            leaves.append(Regexp(field=fld, pattern=pat))
        else:
            leaves.append(Fuzzy(field=fld,
                                term=_rand_term(rng).replace("*", "x")
                                                     .replace("?", "y"),
                                max_edits=rng.randint(0, 2)))
    for leaf in leaves:
        mask = exp_mask(leaf, fs, ts)
        expect = [exp_match(leaf, f, t) for f, t in zip(fields, terms)]
        assert mask.tolist() == expect, leaf


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from lucene_plugin_spark.index.builder import IndexBuilder
    from lucene_plugin_spark.query.executor import SearchEngine
    from lucene_plugin_spark.storage.catalog import Catalog
    import pyspark.sql.functions as F
    wh = str(tmp_path_factory.mktemp("expand-local"))
    cat = Catalog(wh)
    rows = [("r0", f"{i:04d}", "c", "en",
             f"table{i % 7} segment merge{'s' * (i % 3)} spark roam{i % 5}")
            for i in range(200)]
    df = spark.createDataFrame(
        rows, ["repo", "path", "commit", "lang", "content"])
    IndexBuilder(spark, cat, docs_per_slice=50).build(df)
    return cat


def _engines(spark, cat):
    from lucene_plugin_spark.query.executor import SearchEngine
    local = SearchEngine(spark, cat)
    dist = SearchEngine(spark, cat)
    dist.td_local_max_rows = 0  # force the distributed fallback
    assert dist._term_dict_local() is None
    assert local._term_dict_local() is not None
    return local, dist


def test_local_and_distributed_expansion_agree(spark, built):
    local, dist = _engines(spark, built)
    for q in ["[se TO sz]", "{merge TO mergez}", "tab*", "merge?",
              "/table[0-3]/", "roam1~1", "spark~2", "zz*"]:
        a = [(h["path"], round(h["score"], 9))
             for h in local.search(None, q, limit=50).collect()]
        b = [(h["path"], round(h["score"], 9))
             for h in dist.search(None, q, limit=50).collect()]
        assert a == b, q
        assert a or q == "zz*", q  # every pattern but zz* must match docs


def test_local_df_lookup_agrees(spark, built):
    local, dist = _engines(spark, built)
    pairs = [("text", "spark"), ("text", "table1"), ("text", "absentzz")]
    assert local._df_for_pairs(pairs) == dist._df_for_pairs(pairs)
    assert local._df_cache[("text", "absentzz")] == 0.0


def test_prefetch_batch_local_fills_caches(spark, built):
    from lucene_plugin_spark.query.parser import parse_query
    local, dist = _engines(spark, built)
    ranges = [parse_query("tab*"), parse_query("[se TO sz]")]
    exact = {("text", "spark"), ("text", "absentzz")}
    local._prefetch_batch(ranges, exact)
    dist._prefetch_batch(ranges, exact)
    assert local._range_cache == dist._range_cache
    for p in exact:
        assert local._df_cache[p] == dist._df_cache[p]
        assert local._cf_cache[p] == dist._cf_cache[p]
