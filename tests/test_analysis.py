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
