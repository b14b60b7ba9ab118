"""Code-aware analysis chain, vectorized over Arrow buffers end-to-end.

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

Implementation note (scale): every string transform runs inside Arrow C++
compute kernels (RE2 regex, utf8_lower, split, dictionary_encode) over
contiguous columnar buffers — no per-token Python objects anywhere.  Token
*text* exists once per distinct term (the batch-local dictionary); the token
stream itself is int32 codes.  This matters under high task concurrency:
an object-per-token pipeline saturates memory bandwidth long before it
saturates cores, which shows up directly as lost scaling efficiency.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from lucene_plugin_spark.analysis.stopwords import ENGLISH_STOP_WORDS

# camelCase seams (RE2 has no lookarounds; capture groups + backrefs are
# equivalent here because a consumed seam character can never start the next
# seam of the same pattern, and the two patterns run in sequence):
#   lower|digit -> Upper       getUser -> get User
#   ACRONYMWord seam           HTTPServer -> HTTP Server
_CAMEL_1 = (r"([a-z0-9])([A-Z])", r"\1 \2")
_CAMEL_2 = (r"([A-Z])([A-Z][a-z])", r"\1 \2")

# UAX#29 word-internal punctuation (Lucene StandardTokenizer semantics,
# LuceneIndexBean.java:666): an apostrophe BETWEEN letters (MidLetter) and a
# '.'/',' BETWEEN digits (MidNum) do not break the token — don't -> don't,
# 3.14 -> 3.14, 1,024 -> 1,024; dogs' -> dogs (edge punctuation still
# splits).  RE2 has no lookarounds, so the kept characters are swapped for
# control-char placeholders before the split and restored on the (small)
# batch vocabulary afterwards.  Each pattern runs twice: a consumed capture
# can hide an overlapping seam (a'b'c, 1.2.3).
_MID_PROTECT = (
    (r"([a-z])'([a-z])", "\\1\x01\\2"),
    (r"([0-9])\.([0-9])", "\\1\x02\\2"),
    (r"([0-9]),([0-9])", "\\1\x03\\2"),
)
_MID_RESTORE = (("\x01", "'"), ("\x02", "."), ("\x03", ","))
_SPLIT_RE = "[^a-z0-9\x01\x02\x03]+"

_EMPTY = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64),
          pa.array([], type=pa.string()))


def _as_string_array(texts) -> pa.Array:
    if isinstance(texts, pd.Series):
        arr = pa.Array.from_pandas(texts)
    elif isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    else:
        arr = texts
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    elif not pa.types.is_string(arr.type):
        arr = arr.cast(pa.string())
    return arr


def tokenize_codes(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray, pa.Array]:
    """Tokenize strings -> ``(row, code, pos, vocab)``, all post-stop-filter.

    ``row``  int64: positional index of the source string (0..len-1);
    ``code`` int64: index into ``vocab`` (batch-local term dictionary);
    ``pos``  int64: token ordinal in the post-split pre-stop stream (Lucene
    position; stop removal leaves gaps);
    ``vocab`` Arrow StringArray of distinct terms (may include stopwords at
    codes that never appear in ``code``).
    """
    arr = _as_string_array(texts)
    if len(arr) == 0:
        return _EMPTY
    s = pc.replace_substring_regex(arr, pattern=_CAMEL_1[0], replacement=_CAMEL_1[1])
    s = pc.replace_substring_regex(s, pattern=_CAMEL_2[0], replacement=_CAMEL_2[1])
    # no explicit snake_case pass: '_' is outside [a-z0-9], so the split
    # regex separates snake segments with identical tokens AND positions —
    # one fewer full string copy in a memory-bandwidth-bound kernel
    s = pc.utf8_lower(s)
    # the protect passes cost 6 full string scans — skip them when the batch
    # has no word-internal punctuation candidates at all (pure-alnum corpora)
    has_mid = bool(pc.any(pc.match_substring_regex(s, "['.,]")).as_py())
    if has_mid:
        for pat, rep in _MID_PROTECT:
            s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
            s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    lists = pc.split_pattern_regex(s, pattern=_SPLIT_RE)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy().astype(np.int64)
    values = lists.values  # raw child array, aligned with offsets
    counts = np.diff(offsets)
    row = np.repeat(np.arange(len(arr), dtype=np.int64), counts)
    if len(row) == 0:
        return _EMPTY
    # drop the empty tokens the regex split leaves at run boundaries; they
    # were never tokens, so they must not consume positions
    nonempty = pc.greater(pc.binary_length(values), 0)
    np_nonempty = nonempty.to_numpy(zero_copy_only=False)
    if np_nonempty.dtype == object:  # nulls present
        np_nonempty = np.array([bool(x) for x in np_nonempty], dtype=bool)
    values = values.filter(nonempty)
    row = row[np_nonempty]
    if len(row) == 0:
        return _EMPTY
    # position = ordinal among surviving (non-empty) tokens within its row
    kept_counts = np.bincount(row, minlength=len(arr))
    starts = np.zeros(len(arr) + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=starts[1:])
    pos = np.arange(len(row), dtype=np.int64) - starts[row]
    # dictionary-encode: the token stream becomes int32 codes
    d = pc.dictionary_encode(values)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    code = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = d.dictionary
    if has_mid:  # restore protected mid-word punctuation on the small vocab
        for ph, ch in _MID_RESTORE:
            vocab = pc.replace_substring(vocab, pattern=ph, replacement=ch)
    # stop filter applied on the (small) vocab, then gathered per token
    stop_mask = pc.is_in(vocab, value_set=_STOP_ARRAY).to_numpy(zero_copy_only=False)
    if stop_mask.dtype == object:
        stop_mask = np.array([bool(x) for x in stop_mask], dtype=bool)
    keep = ~stop_mask[code]
    return row[keep], code[keep], pos[keep], vocab


_STOP_ARRAY = pa.array(sorted(ENGLISH_STOP_WORDS), type=pa.string())


def tokenize_series(texts: pd.Series) -> pd.DataFrame:
    """Tokenize a Series of strings -> DataFrame(row, term, pos).

    Compatibility surface over :func:`tokenize_codes` (materializes term
    strings; prefer the codes form in hot paths).
    """
    row, code, pos, vocab = tokenize_codes(texts)
    if len(row) == 0:
        return pd.DataFrame({"row": row, "term": pd.Series([], dtype=object),
                             "pos": pos})
    terms = vocab.take(pa.array(code, type=pa.int64())).to_pandas().astype(object)
    return pd.DataFrame({"row": row, "term": terms.reset_index(drop=True), "pos": pos})


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
