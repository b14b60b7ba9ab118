"""Analyzer semantics (SURVEY.md §2.2 A1-A4, §2.7.6)."""

import pandas as pd

from lucene_plugin_spark.analysis.tokenizer import tokenize_series, tokenize_text


def test_basic_lower_and_stop():
    assert tokenize_text("Mary had a little lamb") == [
        ("mary", 0), ("had", 1), ("little", 3), ("lamb", 4)]


def test_positions_skip_stopwords():
    # "the" removed, positions keep the gap (phrase increments survive)
    toks = tokenize_text("over the lazy dog")
    assert toks == [("over", 0), ("lazy", 2), ("dog", 3)]


def test_camel_snake_acronym():
    assert [t for t, _ in tokenize_text("getUserName")] == ["get", "user", "name"]
    assert [t for t, _ in tokenize_text("get_user_name")] == ["get", "user", "name"]
    assert [t for t, _ in tokenize_text("HTTPServer")] == ["http", "server"]


def test_punctuation_split():
    assert [t for t, _ in tokenize_text("foo.bar(baz, qux)")] == [
        "foo", "bar", "baz", "qux"]


def test_series_rows_and_empties():
    df = tokenize_series(pd.Series(["a the", None, "", "one two"]))
    assert df["row"].tolist() == [3, 3]
    assert df["term"].tolist() == ["one", "two"]
    assert df["pos"].tolist() == [0, 1]


def test_all_empty_batch():
    df = tokenize_series(pd.Series(["", None, "the a of"]))
    assert len(df) == 0


# ---------------------------------------------------------------------------
# Scalar fast path vs Arrow chain: exact identity (the fast path carries the
# query parser and the oracle, so any drift would break rank identity)
# ---------------------------------------------------------------------------

def _arrow_tokens(text, variant="standard"):
    df = tokenize_series(pd.Series([text]), variant=variant)
    return list(zip(df["term"].tolist(), df["pos"].tolist()))


TRICKY = [
    "", " ", "the a of", "getUserName", "get_user_name", "HTTPServer",
    "XMLHttpRequest2", "parseHTTPResponse", "don't", "dogs'", "a'b'c",
    "o''clock", "3.14", "1,024", "1.2.3", "1,2,3", "v1.2,3", "'leading",
    "trailing'", ".dot", "dot.", "42", "x86_64", "__init__", "a1B2c3D4",
    "foo.bar(baz, qux)", "Mary had a little lamb", "over the lazy dog",
    "snake_caseAndCamelTOGETHERNow", "ALLCAPS", "aB", "Ab", "a b  c",
    "tab\tnewline\nmix", "semi;colon:and-dash", "quotes\"inside\"here",
    "num3.14ber", "end.", "a.b.c.d.e", "it's don't can't won't",
    "dogs cats foxes queries classes buses", "user's getUserName's",
]


def test_scalar_fast_path_matches_arrow_tricky():
    for s in TRICKY:
        for variant in ("standard", "fold_stem"):
            assert tokenize_text(s, variant=variant) == \
                _arrow_tokens(s, variant=variant), (s, variant)


def test_scalar_fast_path_matches_arrow_corpus():
    from lucene_plugin_spark.corpus import QUERY_SET, generate_rows
    texts = [r["content"] for r in generate_rows(80, seed=7)]
    texts += [q for _, q in QUERY_SET]
    for s in texts:
        for variant in ("standard", "fold_stem"):
            assert tokenize_text(s, variant=variant) == \
                _arrow_tokens(s, variant=variant), (s[:60], variant)


def test_scalar_fast_path_matches_arrow_random():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(
        list("abcXYZ019 _'.,-\t\n()\"") + ["the", "Get", "HTTP", "s"])

    @settings(max_examples=300, deadline=None)
    @given(st.lists(alphabet, max_size=40).map("".join))
    def check(s):
        assert tokenize_text(s) == _arrow_tokens(s)
        assert tokenize_text(s, variant="fold_stem") == \
            _arrow_tokens(s, variant="fold_stem")

    check()


def test_non_ascii_falls_back_and_agrees():
    for s in ["café au lait", "naïve résumé", "ünïcode Ähnlich",
              "ß sharp", "œuvre", "mixedCafé.getÜser"]:
        for variant in ("standard", "fold_stem"):
            assert tokenize_text(s, variant=variant) == \
                _arrow_tokens(s, variant=variant), (s, variant)


def test_token_array_col_matches_kernel_positions(spark):
    """token_array_col (the Spark Column twin of the PRE-stop token
    stream used to cut passage snippets) must agree with the Arrow kernel
    token-for-token AND position-for-position: the element at index
    ``pos`` is exactly the term the kernel emitted at position ``pos``."""
    import pandas as pd
    import pyarrow as pa

    from lucene_plugin_spark.analysis.tokenizer import (token_array_col,
                                                        tokenize_codes)
    texts = [
        "parseQueryString and  snake_case_token values 42",
        "don't split 3.14 or 1,024 but dogs' splits",
        "a'b'c 1.2.3 XMLHttpRequest  trailing  ",
        "", "   ", "ALLCAPS miXedUp42Case",
        "the a an of stopwords keep their positions",
        "x" * 300 + " yEndOfLongRun",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["a"] for r in
           df.select(token_array_col("t").alias("a")).collect()]
    for t, arr in zip(texts, got):
        row, code, pos, vocab = tokenize_codes(pd.Series([t]))
        terms = vocab.take(pa.array(code)).to_pylist()
        for term, p in zip(terms, pos):
            assert arr[p] == term, (t, term, p, arr)


def test_token_array_col_random(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pandas as pd
    import pyarrow as pa

    from lucene_plugin_spark.analysis.tokenizer import (token_array_col,
                                                        tokenize_codes)
    chunk = st.one_of(
        st.text(st.sampled_from("abcXYZ09 _'.,-!\t"), min_size=0,
                max_size=8),
        st.sampled_from(["don't", "3.14", "1,024", "aB", "XMLHttp"]))
    texts_strategy = st.lists(
        st.lists(chunk, min_size=0, max_size=5).map("".join),
        min_size=1, max_size=12)

    @settings(max_examples=25, deadline=None)
    @given(texts_strategy)
    def check(texts):
        df = spark.createDataFrame([(t,) for t in texts], "t string")
        got = [r["a"] for r in
               df.select(token_array_col("t").alias("a")).collect()]
        for t, arr in zip(texts, got):
            row, code, pos, vocab = tokenize_codes(pd.Series([t]))
            terms = vocab.take(pa.array(code)).to_pylist()
            for term, p in zip(terms, pos):
                assert arr[p] == term, (t, term, p, arr)

    check()
