"""Multi-term leaf expansion shared by the executor and the Python oracle.

Range / Wildcard / Fuzzy leaves all rewrite to an OR-of-terms against the
term dictionary (Lucene MultiTermQuery constant-score rewrite; the reference
reaches these through its classic QueryParser, LuceneIndexBean.java:727-735).
This module centralizes the three predicate forms so the Spark path
(term_dict scan), the driver-side membership check (prefetch fan-back) and
the pure-Python oracle compute the SAME term sets:

- Range:    lexicographic bounds, inclusive (``[lo TO hi]``) or exclusive
  (``{lo TO hi}``) per end — classic QueryParser range syntax;
- Wildcard: anchored regex from ``*``/``?`` translation;
- Fuzzy:    classic Levenshtein <= max_edits — Spark ``F.levenshtein`` and
  DuckDB ``levenshtein`` are both the classic DP, so the oracle uses the
  same (Lucene's FuzzyQuery is Damerau; transpositions costing 2 here is a
  documented deviation, see query/plan.py).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from lucene_plugin_spark.query.plan import Fuzzy, Range, Regexp, Wildcard

#: leaf types that expand to OR-of-terms via the term dictionary
EXPANDABLE = (Range, Wildcard, Fuzzy, Regexp)


def wildcard_prefix(pattern: str) -> str:
    """Literal prefix implied by every wildcard match: the unescaped
    literal run before the first unescaped ``*``/``?``.  ``te\\*t*`` ->
    ``te*t`` (the escaped star is a literal), NOT ``te\\`` — the raw
    backslash must not leak into a ``startswith`` pushdown."""
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            out.append(pattern[i + 1])
            i += 2
            continue
        if ch in "*?":
            break
        out.append(ch)
        i += 1
    return "".join(out)


#: regex metacharacters that terminate a literal prefix
_REGEXP_META = set("\\.[](){}*+?|^$")


def regexp_prefix(pattern: str) -> str:
    """Literal prefix implied by EVERY match of the (anchored) regexp,
    or ``''`` when no sound prefix exists.  Soundness rules:

    - any unescaped top-level ``|`` kills the pushdown entirely
      (``a|b`` matches ``b`` without the ``a`` prefix);
    - if the first metachar is a zero-min quantifier (``*``, ``?``,
      ``{``), the preceding literal is optional — trim it
      (``segments?`` matches ``segment``; prefix is ``segment``);
    - stop at ``\\`` conservatively (escaped literal could extend the
      prefix, but a shorter prefix is always sound)."""
    depth = 0
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "|" and depth == 0:
            return ""
        i += 1
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch in _REGEXP_META:
            if ch in "*?{" and out:
                out.pop()
            break
        out.append(ch)
        i += 1
    return "".join(out)


def wildcard_infix_gram(pattern: str, n: int = 2) -> str | None:
    """One character ``n``-gram contained in EVERY match of the wildcard
    pattern, or ``None`` when no literal run reaches ``n`` chars: the
    middle ``n``-gram of the longest unescaped literal run.  A match must
    contain the whole run, hence each of its n-grams — so any single such
    gram makes a gram-sidecar posting a lossless candidate superset for
    infix patterns (``*tabl*``) that have no sargable prefix."""
    runs, cur = [], []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            cur.append(pattern[i + 1])
            i += 2
            continue
        if ch in "*?":
            runs.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    runs.append("".join(cur))
    best = max(runs, key=len)
    if len(best) < n:
        return None
    m = (len(best) - n) // 2
    return best[m:m + n]


def wildcard_min_len(pattern: str) -> int:
    """Minimum length of any term matching the wildcard pattern (``*``
    matches the empty string, ``?`` and literals one char each)."""
    cnt = 0
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            cnt += 1
            i += 2
            continue
        if ch != "*":
            cnt += 1
        i += 1
    return cnt


def wildcard_regex(pattern: str) -> str:
    """``te?t*`` -> anchored regex (``*`` any run, ``?`` one char;
    ``\\*``/``\\?`` escape to literals, classic QueryParser escaping)."""
    parts = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            parts.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(re.escape(ch))
        i += 1
    return "^" + "".join(parts) + "$"


def levenshtein(a: str, b: str) -> int:
    """Classic Levenshtein DP — matches Spark's F.levenshtein and DuckDB's
    levenshtein() exactly (unit-cost insert/delete/substitute)."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def exp_key(leaf) -> tuple:
    """Stable cache key for an expandable leaf (boost-independent: the
    expansion is the term set, boost only scales scores)."""
    if isinstance(leaf, Range):
        return ("range", leaf.field, leaf.lo, leaf.hi,
                leaf.include_lo, leaf.include_hi)
    if isinstance(leaf, Wildcard):
        return ("wild", leaf.field, leaf.pattern)
    if isinstance(leaf, Regexp):
        return ("regexp", leaf.field, leaf.pattern)
    return ("fuzzy", leaf.field, leaf.term, leaf.max_edits)


def exp_cond(leaf):
    """Spark Column predicate over term_dict(field, term) for one leaf.

    Sargable conjuncts reach the parquet scan (verified via
    ``.explain("formatted")``, BENCH/PLANS.md §7): the field equality, the
    range bounds, and — for wildcard patterns with a literal prefix (the
    common ``quer*`` case) — a ``StringStartsWith`` on that prefix, which
    prunes the term-sorted row groups like a range would.  The
    rlike/levenshtein conjuncts are not sargable and run in the
    whole-stage-codegen filter on the pruned rows only; a fuzzy leaf with
    no usable prefix is an honest full term_dict scan (Lucene walks an FST
    with a Levenshtein DFA instead — its dictionary is a different
    structure; ours is a distributed columnar scan that is tiny relative
    to the corpus and parallelizes with executors)."""
    base = F.col("field") == leaf.field
    if isinstance(leaf, Range):
        lo_c = (F.col("term") >= leaf.lo) if leaf.include_lo \
            else (F.col("term") > leaf.lo)
        hi_c = (F.col("term") <= leaf.hi) if leaf.include_hi \
            else (F.col("term") < leaf.hi)
        return base & lo_c & hi_c
    if isinstance(leaf, Wildcard):
        cond = base & F.col("term").rlike(wildcard_regex(leaf.pattern))
        prefix = wildcard_prefix(leaf.pattern)
        if prefix:
            cond = F.col("term").startswith(prefix) & cond
        return cond
    if isinstance(leaf, Regexp):
        # Lucene RegexpQuery matches the WHOLE term: anchor rlike's
        # substring semantics.  A literal prefix IMPLIED BY EVERY MATCH
        # (regexp_prefix handles zero-min quantifiers and top-level
        # alternation) is pushed as a sargable StringStartsWith, like
        # the wildcard case.
        cond = base & F.col("term").rlike(f"^(?:{leaf.pattern})$")
        prefix = regexp_prefix(leaf.pattern)
        if prefix:
            cond = F.col("term").startswith(prefix) & cond
        return cond
    n = len(leaf.term)
    return (base
            & (F.length("term") >= n - leaf.max_edits)
            & (F.length("term") <= n + leaf.max_edits)
            & (F.levenshtein(F.col("term"), F.lit(leaf.term)) <= leaf.max_edits))


def exp_mask(leaf, fields, terms):
    """Vectorized membership over a driver-local term dictionary: boolean
    numpy mask with ``mask[i] == exp_match(leaf, fields[i], terms[i])``.

    ``fields``/``terms`` are pandas Series.  Range is fully vectorized;
    Wildcard/Regexp prefilter with the sound literal prefix
    (``wildcard_prefix``/``regexp_prefix`` — same pushdown as the Spark
    path) then run the compiled regex on survivors only; Fuzzy prefilters
    with the length band before the Python DP.  Property-tested against
    :func:`exp_match` element-wise (test_nested_property.py)."""
    import numpy as np

    m = (fields == leaf.field).to_numpy(dtype=bool, copy=True)
    if not m.any():
        return m
    if isinstance(leaf, Range):
        t = terms.to_numpy()
        lo = (t >= leaf.lo) if leaf.include_lo else (t > leaf.lo)
        hi = (t <= leaf.hi) if leaf.include_hi else (t < leaf.hi)
        return m & lo & hi
    if isinstance(leaf, (Wildcard, Regexp)):
        prefix = (wildcard_prefix(leaf.pattern) if isinstance(leaf, Wildcard)
                  else regexp_prefix(leaf.pattern))
        if prefix:
            m &= terms.str.startswith(prefix).to_numpy(dtype=bool)
        idx = np.flatnonzero(m)
        if idx.size:
            if isinstance(leaf, Wildcard):
                rx = re.compile(wildcard_regex(leaf.pattern))
                hit = [rx.match(x) is not None for x in terms.iloc[idx]]
            else:
                rx = re.compile(leaf.pattern)
                hit = [rx.fullmatch(x) is not None for x in terms.iloc[idx]]
            m[idx] = hit
        return m
    # Fuzzy: length band (same sargable conjunct as exp_cond), DP on rest
    n = len(leaf.term)
    lens = terms.str.len().to_numpy()
    m &= (lens >= n - leaf.max_edits) & (lens <= n + leaf.max_edits)
    idx = np.flatnonzero(m)
    if idx.size:
        m[idx] = [levenshtein(x, leaf.term) <= leaf.max_edits
                  for x in terms.iloc[idx]]
    return m


def exp_match(leaf, field: str, term: str) -> bool:
    """Driver/oracle-side membership test — same semantics as exp_cond."""
    if field != leaf.field:
        return False
    if isinstance(leaf, Range):
        lo_ok = (term >= leaf.lo) if leaf.include_lo else (term > leaf.lo)
        hi_ok = (term <= leaf.hi) if leaf.include_hi else (term < leaf.hi)
        return lo_ok and hi_ok
    if isinstance(leaf, Wildcard):
        return re.match(wildcard_regex(leaf.pattern), term) is not None
    if isinstance(leaf, Regexp):
        return re.fullmatch(leaf.pattern, term) is not None
    return levenshtein(term, leaf.term) <= leaf.max_edits
