"""Code-aware analysis chain, vectorized over Arrow/pandas batches.

Re-creates the reference's analyzer semantics (StandardAnalyzer configured at
LuceneIndexBean.java:666: UAX#29-ish word boundaries -> lowercase -> English
stop filter with position increments preserved) and extends it with the
code-aware splitting required by the north rule:

1. raw token extraction: maximal ``[A-Za-z0-9_]+`` runs;
2. snake_case split: ``get_user_name`` -> ``get``, ``user``, ``name``;
3. camelCase / acronym split: ``getUserName`` -> ``get``, ``User``, ``Name``;
   ``HTTPServer`` -> ``HTTP``, ``Server``;
4. lowercase;
5. stop filter against the Lucene English 33-word set, *preserving positions*:
   a surviving token keeps its ordinal in the pre-stop expanded stream, so
   phrase queries skip over removed stopwords exactly like Lucene position
   increments (SURVEY.md §2.7.6).

Everything is pandas-vectorized (``.str`` ops + numpy index math) — no
per-row Python in the Spark hot path (``input_hint`` requirement).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_plugin_spark.analysis.stopwords import ENGLISH_STOP_WORDS

# Raw token runs (step 1).
TOKEN_RE = r"[A-Za-z0-9_]+"
# camelCase boundaries (step 3): lower|digit -> Upper, and ACRONYMWord seam.
_CAMEL_1 = r"(?<=[a-z0-9])(?=[A-Z])"
_CAMEL_2 = r"(?<=[A-Z])(?=[A-Z][a-z])"


def tokenize_series(texts: pd.Series) -> pd.DataFrame:
    """Tokenize a Series of strings -> DataFrame(row, term, pos).

    ``row`` is the positional index into ``texts`` (0..len-1), ``pos`` is the
    token's ordinal in the post-split, pre-stop-removal stream (Lucene
    position).  Stopwords are removed; their positions are skipped.
    """
    texts = texts.fillna("").astype(str).reset_index(drop=True)
    # Steps 2-3 as string surgery *before* extraction keeps everything in two
    # vectorized passes: insert spaces at camel seams, turn '_' into spaces.
    prepped = (
        texts.str.replace(_CAMEL_1, " ", regex=True)
        .str.replace(_CAMEL_2, " ", regex=True)
        .str.replace("_", " ", regex=False)
    )
    toks = prepped.str.findall(TOKEN_RE)
    counts = toks.str.len().to_numpy(dtype=np.int64)
    row = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    if len(row) == 0:
        return pd.DataFrame({"row": row, "term": pd.Series([], dtype=object),
                             "pos": np.array([], dtype=np.int64)})
    flat = pd.Series(np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)]),
                     dtype=object)
    flat = flat.str.lower()
    # position = ordinal within its row in the expanded stream
    starts = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(len(row), dtype=np.int64) - starts[row]
    keep = ~flat.isin(ENGLISH_STOP_WORDS).to_numpy()
    return pd.DataFrame(
        {"row": row[keep], "term": flat[keep].reset_index(drop=True), "pos": pos[keep]}
    )


def tokenize_text(text: str) -> list[tuple[str, int]]:
    """Single-string convenience (driver-side / oracle): [(term, pos), ...]."""
    df = tokenize_series(pd.Series([text]))
    return list(zip(df["term"].tolist(), df["pos"].tolist()))


def analyze_query_terms(text: str) -> list[str]:
    """Analyze free text the way the query parser does (terms only, in order).

    Mirrors the reference, where the classic QueryParser runs the same
    analyzer over query text (LuceneIndexBean.java:727-735): stopwords in the
    query vanish, camelCase query tokens split into sub-terms.
    """
    return [t for t, _ in tokenize_text(text)]
