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

import re
from functools import lru_cache

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

# --------------------------------------------------------------------------
# analyzer variants (index-time option, round-tripped through the catalog's
# segments snapshot properties so the query side always analyzes with the
# SAME chain the index was built with — Lucene's per-index Analyzer wiring,
# reference LuceneIndexBean.java:666)
#
# "fold_stem" = standard chain + two extra filters:
#   * ASCII folding (Lucene ASCIIFoldingFilter's Latin-1 subset) applied
#     after lowercase, BEFORE the split — an accented char is outside
#     [a-z0-9], so unfolded it would break the token ('café' -> 'caf');
#   * minimal-English S-stemmer (Harman 1991: -ies->-y, -es->-e, -s->'')
#     applied to the post-stop vocabulary.  Deliberately SQL-expressible
#     (the DuckDB oracle mirrors both via fold_sql()/stem_sql()) unlike
#     Porter, whose rule cascade is not reasonably expressible in ANSI SQL.
# --------------------------------------------------------------------------

#: (accented, ascii) pairs — lowercase only (folding runs after utf8_lower)
FOLD_PAIRS: list[tuple[str, str]] = [
    ("á", "a"), ("à", "a"), ("â", "a"), ("ä", "a"), ("ã", "a"), ("å", "a"),
    ("é", "e"), ("è", "e"), ("ê", "e"), ("ë", "e"),
    ("í", "i"), ("ì", "i"), ("î", "i"), ("ï", "i"),
    ("ó", "o"), ("ò", "o"), ("ô", "o"), ("ö", "o"), ("õ", "o"), ("ø", "o"),
    ("ú", "u"), ("ù", "u"), ("û", "u"), ("ü", "u"),
    ("ç", "c"), ("ñ", "n"), ("ý", "y"), ("ÿ", "y"),
    ("æ", "ae"), ("œ", "oe"), ("ß", "ss"),
]

ANALYZER_VARIANTS = ("standard", "fold_stem")


def stem_s_word(w: str) -> str:
    """Harman S-stemmer with a len>3 guard (shorter plurals are ambiguous
    and the English stop list already removes 'is'/'as'/'this').  Each rule's
    exception TERMINATES (Harman: 'goes' keeps its -oes, it does not fall
    through to the bare-s rule)."""
    if len(w) < 4:
        return w
    if w.endswith("ies"):
        return w if w.endswith(("eies", "aies")) else w[:-3] + "y"
    if w.endswith("es"):
        return w if w.endswith(("aes", "ees", "oes")) else w[:-1]
    if w.endswith("s"):
        return w if w.endswith(("us", "ss")) else w[:-1]
    return w


def fold_ascii_text(s: str) -> str:
    """Scalar folding (oracle/driver side) — same table as the Arrow path."""
    for acc, rep in FOLD_PAIRS:
        s = s.replace(acc, rep)
    return s


def stem_sql(expr: str) -> str:
    """ANSI-SQL S-stemmer over a term expression — the DuckDB-oracle twin of
    :func:`stem_s_word` (same rules, same guard)."""
    return (f"CASE WHEN len({expr}) < 4 THEN {expr} "
            f"WHEN {expr} LIKE '%ies' THEN "
            f"(CASE WHEN {expr} LIKE '%eies' OR {expr} LIKE '%aies' "
            f"THEN {expr} ELSE substr({expr}, 1, len({expr}) - 3) || 'y' END) "
            f"WHEN {expr} LIKE '%es' THEN "
            f"(CASE WHEN {expr} LIKE '%aes' OR {expr} LIKE '%ees' "
            f"OR {expr} LIKE '%oes' "
            f"THEN {expr} ELSE substr({expr}, 1, len({expr}) - 1) END) "
            f"WHEN {expr} LIKE '%s' THEN "
            f"(CASE WHEN {expr} LIKE '%us' OR {expr} LIKE '%ss' "
            f"THEN {expr} ELSE substr({expr}, 1, len({expr}) - 1) END) "
            f"ELSE {expr} END")


def fold_sql(expr: str) -> str:
    """Chained replace() over the folding table — DuckDB-oracle twin of the
    Arrow folding pass (expects an already-lowercased expression)."""
    out = expr
    for acc, rep in FOLD_PAIRS:
        out = f"replace({out}, '{acc}', '{rep}')"
    return out


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


def tokenize_codes(texts, variant: str = "standard"
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray, pa.Array]:
    """Tokenize strings -> ``(row, code, pos, vocab)``, all post-stop-filter.

    ``row``  int64: positional index of the source string (0..len-1);
    ``code`` int64: index into ``vocab`` (batch-local term dictionary);
    ``pos``  int64: token ordinal in the post-split pre-stop stream (Lucene
    position; stop removal leaves gaps);
    ``vocab`` Arrow StringArray of distinct terms (may include stopwords at
    codes that never appear in ``code``);
    ``variant``: "standard" or "fold_stem" (module docs above).
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
    if variant == "fold_stem":
        # fold only when the batch actually has non-ASCII bytes — 31 full
        # string scans are not free on a memory-bandwidth-bound kernel
        if bool(pc.any(pc.match_substring_regex(s, "[^\\x00-\\x7f]")).as_py()):
            for acc, rep in FOLD_PAIRS:
                s = pc.replace_substring(s, pattern=acc, replacement=rep)
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
    row, code, pos = row[keep], code[keep], pos[keep]
    if variant == "fold_stem":
        # stem the (small) vocab AFTER the stop filter (Lucene filter order:
        # stop -> stem), then re-encode so stemmed collisions ('dogs' and
        # 'dog') share one code — duplicate vocab entries would split tf/df
        stemmed = pa.array([stem_s_word(t) for t in vocab.to_pylist()],
                           type=pa.string())
        enc = pc.dictionary_encode(stemmed)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        remap = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        code = remap[code]
        vocab = enc.dictionary
    return row, code, pos, vocab


_STOP_ARRAY = pa.array(sorted(ENGLISH_STOP_WORDS), type=pa.string())


def tokenize_series(texts: pd.Series, variant: str = "standard") -> pd.DataFrame:
    """Tokenize a Series of strings -> DataFrame(row, term, pos).

    Compatibility surface over :func:`tokenize_codes` (materializes term
    strings; prefer the codes form in hot paths).
    """
    row, code, pos, vocab = tokenize_codes(texts, variant=variant)
    if len(row) == 0:
        return pd.DataFrame({"row": row, "term": pd.Series([], dtype=object),
                             "pos": pos})
    terms = vocab.take(pa.array(code, type=pa.int64())).to_pandas().astype(object)
    return pd.DataFrame({"row": row, "term": terms.reset_index(drop=True), "pos": pos})


_CAMEL_1_RE = re.compile(_CAMEL_1[0])
_CAMEL_2_RE = re.compile(_CAMEL_2[0])
_MID_PROTECT_RE = tuple((re.compile(p), r) for p, r in _MID_PROTECT)
_SPLIT_RE_PY = re.compile(_SPLIT_RE)


def _tokenize_text_scalar(text: str, variant: str) -> list[tuple[str, int]]:
    """Pure-Python scalar twin of :func:`tokenize_codes` for ASCII strings.

    The Arrow chain's per-call pandas/Arrow wrapping costs ~2.4 ms — nothing
    for a corpus batch, but it IS the query parser's per-leaf cost, and that
    is serial driver time a batch of queries pays per leaf (the Amdahl term
    in the N->4N batch-query scaling pair).  This path re-implements the
    exact same chain with `re` in ~20 us.  ASCII-gated by the caller: the
    only step whose semantics could drift cross-engine is lowercasing of
    non-ASCII codepoints (str.lower vs utf8_lower), so non-ASCII input falls
    back to the Arrow path.  Identity is pytest-gated property-style against
    the Arrow chain (test_analysis.py) on corpus text, every query-set
    shape, and random strings."""
    s = _CAMEL_1_RE.sub(_CAMEL_1[1], text)
    s = _CAMEL_2_RE.sub(_CAMEL_2[1], s)
    s = s.lower()
    # fold pass skipped: FOLD_PAIRS are all non-ASCII, absent by the gate
    if "'" in s or "." in s or "," in s:
        for rx, rep in _MID_PROTECT_RE:
            s = rx.sub(rep, s)
            s = rx.sub(rep, s)
    toks = [t for t in _SPLIT_RE_PY.split(s) if t]
    out: list[tuple[str, int]] = []
    for pos, t in enumerate(toks):
        t = (t.replace("\x01", "'").replace("\x02", ".")
             .replace("\x03", ","))
        if t in ENGLISH_STOP_WORDS:
            continue  # position increment preserved: pos keeps its ordinal
        if variant == "fold_stem":
            t = stem_s_word(t)
        out.append((t, pos))
    return out


@lru_cache(maxsize=4096)
def _tokenize_cached(text: str, variant: str) -> tuple[tuple[str, int], ...]:
    """Short ASCII strings only (query leaves repeat across a stream —
    the analyzer analogue of the reference's parsed-query LRU)."""
    return tuple(_tokenize_text_scalar(text, variant))


def tokenize_text(text: str, variant: str = "standard") -> list[tuple[str, int]]:
    """Single-string convenience (driver-side / oracle): [(term, pos), ...]."""
    if isinstance(text, str) and text.isascii():
        if len(text) <= 256:
            return list(_tokenize_cached(text, variant))
        return _tokenize_text_scalar(text, variant)
    df = tokenize_series(pd.Series([text]), variant=variant)
    return list(zip(df["term"].tolist(), df["pos"].tolist()))


def analyze_query_terms(text: str, variant: str = "standard") -> list[str]:
    """Analyze free text the way the query parser does (terms only, in order).

    Mirrors the reference, where the classic QueryParser runs the same
    analyzer over query text (LuceneIndexBean.java:727-735): stopwords in the
    query vanish, camelCase query tokens split into sub-terms.
    """
    return [t for t, _ in tokenize_text(text, variant=variant)]


def token_array_col(col):
    """Spark Column twin of :func:`tokenize_codes`' PRE-stop token stream:
    an ``array<string>`` whose element at index ``pos`` is the token the
    analyzer emitted at position ``pos`` (stopwords included — positions
    count them; only empty split artifacts are dropped, exactly like the
    Arrow kernel).  Used where stored text must be sliced by analyzer
    positions (passage snippets): a literal whitespace split misaligns the
    window on camelCase, punctuation-adjacent tokens, or runs of spaces.

    Standard-variant only (mirrors the default chain: camel split, lower,
    UAX#29 mid-word protect, class split, restore)."""
    import pyspark.sql.functions as F
    c = col if not isinstance(col, str) else F.col(col)
    s = F.regexp_replace(c, "([a-z0-9])([A-Z])", "$1 $2")
    s = F.regexp_replace(s, "([A-Z])([A-Z][a-z])", "$1 $2")
    s = F.lower(s)
    for pat, rep in _MID_PROTECT:
        jrep = rep.replace("\\1", "$1").replace("\\2", "$2")
        # twice: a consumed capture can hide an overlapping seam
        s = F.regexp_replace(s, pat, jrep)
        s = F.regexp_replace(s, pat, jrep)
    toks = F.filter(F.split(s, _SPLIT_RE), lambda x: x != "")
    for ph, ch in _MID_RESTORE:
        toks = F.transform(toks, lambda x: F.regexp_replace(x, ph, ch))
    return toks
