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


def test_fuzzy_gram_expansion_agrees(spark, built):
    """Fuzzy expansion via the spell_grams sidecar (the 100 TB-vocabulary
    path) is output-identical to the resident-mask and term_dict-scan
    strategies, including the '' short-term bucket probe."""
    local, dist = _engines(spark, built)
    gram = _engines(spark, built)[1]
    gram.gram_expand = "gram"
    scan = _engines(spark, built)[1]
    scan.gram_expand = "scan"
    for q in ["roam1~1", "spark~2", "merge~1", "a~2", "tabl~2"]:
        want = [(h["path"], round(h["score"], 9))
                for h in local.search(None, q, limit=100).collect()]
        for eng in (dist, gram, scan):
            got = [(h["path"], round(h["score"], 9))
                   for h in eng.search(None, q, limit=100).collect()]
            assert got == want, (q, eng.gram_expand)
        assert want or q == "a~2", q


def test_fuzzy_gram_auto_routes_when_no_resident_dict(spark, built):
    """auto picks the sidecar exactly when the resident dictionary is
    unavailable and the reader is unpinned; max_edits > 2 stays on the
    exact scan (pigeonhole bound void)."""
    local, dist = _engines(spark, built)
    assert not local._gram_route(Fuzzy(field="text", term="spark",
                                             max_edits=1))
    assert dist._gram_route(Fuzzy(field="text", term="spark",
                                        max_edits=2))
    assert not dist._gram_route(Fuzzy(field="text", term="spark",
                                            max_edits=3))
    assert not dist._gram_route(Range(field="text", lo="a", hi="b",
                                            include_lo=True,
                                            include_hi=True))


def test_fuzzy_gram_prefetch_fills_caches(spark, built):
    """_prefetch_batch routes eligible fuzzies through the sidecar and
    fills the same range/df/cf cache entries as the in-process path."""
    from lucene_plugin_spark.query.parser import parse_query
    local, dist = _engines(spark, built)
    dist.gram_expand = "gram"
    ranges = [parse_query("spark~1"), parse_query("roam1~1"),
              parse_query("tab*")]
    exact = {("text", "segment")}
    local._prefetch_batch(ranges, exact)
    dist._prefetch_batch(ranges, exact)
    assert local._range_cache == dist._range_cache
    # every term the fuzzy expansion surfaced carries the true df/cf
    for key, terms in local._range_cache.items():
        if key[0] != "fuzzy":
            continue
        for t in terms:
            assert dist._df_cache[("text", t)] == local._df_cache[("text", t)]
            assert dist._cf_cache[("text", t)] == local._cf_cache[("text", t)]


def test_wildcard_infix_gram_helpers():
    from lucene_plugin_spark.query.expand import (wildcard_infix_gram,
                                                  wildcard_min_len)
    assert wildcard_infix_gram("*tabl*") in {"ta", "ab", "bl"}
    assert wildcard_infix_gram("*a*") is None          # run too short
    assert wildcard_infix_gram("??") is None           # no literal run
    assert wildcard_infix_gram(r"*ta\*l*") == "a*"     # escaped star literal
    assert wildcard_infix_gram("me?ge*") in {"me", "ge"}
    assert wildcard_min_len("*tabl*") == 4
    assert wildcard_min_len("ta?e*") == 4
    assert wildcard_min_len("*") == 0
    assert wildcard_min_len(r"\**") == 1


def test_wildcard_gram_expansion_agrees(spark, built):
    """Infix wildcards via the gram sidecar match the resident-mask and
    term_dict-scan strategies exactly (constant-score expansion)."""
    local, dist = _engines(spark, built)
    gram = _engines(spark, built)[1]
    gram.gram_expand = "gram"
    for q in ["*abl*", "*erge*", "*roam*", "*zz*", "*egmen?"]:
        want = [(h["path"], round(h["score"], 9))
                for h in local.search(None, q, limit=200).collect()]
        for eng in (dist, gram):
            got = [(h["path"], round(h["score"], 9))
                   for h in eng.search(None, q, limit=200).collect()]
            assert got == want, (q, getattr(eng, "gram_expand", "auto"))
        assert want or q == "*zz*", q


def test_wildcard_gram_routing_rules(spark, built):
    """Sidecar routing only for infix patterns with a usable gram; strong
    prefixes keep the sargable StringStartsWith scan."""
    _, dist = _engines(spark, built)
    assert dist._gram_route(Wildcard(field="text", pattern="*abl*"))
    assert not dist._gram_route(Wildcard(field="text", pattern="tab*"))
    assert not dist._gram_route(Wildcard(field="text", pattern="*a*"))
    assert not dist._gram_route(Wildcard(field="text", pattern="t?"))
