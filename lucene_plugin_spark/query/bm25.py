"""BM25 scoring math, shared by the Spark executors and the pure-Python oracle.

Parameters fixed by the north rule: k1=1.2, b=0.75 — exactly Lucene's
``BM25Similarity`` defaults.  (Honest delta vs the reference binary: Lucene
*5.2.1* defaulted to TF-IDF and the plugin never called ``setSimilarity``
(LuceneIndexBean.java:664-691); the north rule pins the target scoring to
BM25, so that is what both our engine and our oracle implement.)

``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``
``score(t, d) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))``
summed over query terms; ranking is (score desc, doc_id asc) — Lucene's
tie-break (SURVEY.md §2.7.5).
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    """The document-dependent factor: tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))."""
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def score(tf: np.ndarray, dl: np.ndarray, df: float, n_docs: float, avgdl: float) -> np.ndarray:
    return idf(df, n_docs) * tf_norm(tf, dl, avgdl)


def block_upper_bound(max_tf: float, min_dl: float, avgdl: float) -> float:
    """Query-time WAND upper bound factor for a block: tf_norm is monotone
    increasing in tf and decreasing in dl, so tf_norm(max_tf, min_dl, avgdl)
    bounds every doc in the block under the CURRENT corpus stats (SURVEY.md
    §4 P6; blocks store (block_max_tf, block_min_dl))."""
    return float(tf_norm(np.asarray([max_tf], dtype=float),
                         np.asarray([min_dl], dtype=float), avgdl)[0])


# SQL fragment (ANSI, DuckDB-compatible) computing the same score — used to
# build oracle queries.  Placeholders: {tf}, {dl}, {df}, {n}, {avgdl}.
SCORE_SQL = (
    "ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5)) * "
    "({tf} * (1.2 + 1.0) / ({tf} + 1.2 * (1.0 - 0.75 + 0.75 * {dl} / {avgdl})))"
)
