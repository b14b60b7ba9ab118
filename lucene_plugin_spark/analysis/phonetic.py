"""Phonetic encoding — the lucene analyzers-phonetic module family (5.2
ships ``PhoneticFilter`` over commons-codec encoders; Soundex is the
classic).  One encoder, defined ONCE as a regex pipeline with a Python and
a SQL twin, so the engine and the DuckDB oracle share the exact algorithm
by construction:

American Soundex (Knuth Vol. 3):

1. letters code as  bfpv→1  cgjkqsxz→2  dt→3  l→4  mn→5  r→6,
   vowels+y→0 (separators), h/w are TRANSPARENT (removed before run
   collapsing, so same-code letters across h/w code once);
2. adjacent equal codes collapse; the first letter's own code is dropped;
3. result = first letter (uppercased) + first three remaining non-zero
   digits, zero-padded — always 4 chars.

Edge choice (documented): when the FIRST letter is h or w it is still
retained as the output letter but is transparent for coding, matching the
commons-codec behavior of coding from the first CODABLE letter.

The scale story mirrors the spell_grams reasoning: Soundex preserves the
first letter, so a phonetic lookup prunes the term-sorted dictionary with
a SARGABLE ``startswith(first_letter)`` range — 1/26th of the vocabulary
per query — before computing codes on the pruned slice; a persisted
(field, soundex) sidecar generalizes this to exact pushdown at 10^12-doc
vocabularies exactly like the 2-gram sidecar does for fuzzy.
"""

from __future__ import annotations

import re

#: (pattern, replacement) pipeline — applied in order to the lowercased
#: TAIL (everything after the first letter is handled uniformly; the first
#: letter is coded too, then its code is dropped)
_STEPS: list[tuple[str, str]] = [
    (r"[hw]", ""),               # transparent
    (r"[bfpv]", "1"),
    (r"[cgjkqsxz]", "2"),
    (r"[dt]", "3"),
    (r"l", "4"),
    (r"[mn]", "5"),
    (r"r", "6"),
    (r"[a-z]", "0"),             # vowels + y: separators
    # collapse runs — one explicit step per digit (RE2, the regex engine
    # DuckDB embeds, has no pattern backreferences, so '(.)\1+' is out)
    (r"00+", "0"), (r"11+", "1"), (r"22+", "2"), (r"33+", "3"),
    (r"44+", "4"), (r"55+", "5"), (r"66+", "6"),
]


def soundex(term: str) -> str:
    """American Soundex of ``term`` (letters only considered); '' for
    input with no ASCII letter."""
    t = re.sub(r"[^a-z]", "", term.lower())
    if not t:
        return ""
    s = t
    for pat, rep in _STEPS:
        s = re.sub(pat, rep, s)
    s = s[1:]                    # drop the first letter's own code
    s = s.replace("0", "")
    return (t[0].upper() + (s + "000")[:3])


def soundex_sql(expr: str) -> str:
    """The identical pipeline as a DuckDB SQL expression over ``expr`` (a
    lowercase-letters-only string expression)."""
    s = expr
    for pat, rep in _STEPS:
        s = f"regexp_replace({s}, '{pat}', '{rep}', 'g')"
    return (f"upper(substr({expr}, 1, 1)) || "
            f"substr(replace(substr({s}, 2), '0', '') || '000', 1, 3)")


def soundex_col(col):
    """The identical pipeline as a Spark Column (Java regex — the step
    patterns avoid engine-specific syntax, so all three twins share the
    exact rule set)."""
    import pyspark.sql.functions as F
    c = col if not isinstance(col, str) else F.col(col)
    t = F.regexp_replace(F.lower(c), "[^a-z]", "")
    s = t
    for pat, rep in _STEPS:
        s = F.regexp_replace(s, pat, rep)
    tail = F.regexp_replace(F.substring(s, 2, 1 << 20), "0", "")
    code = F.concat(F.upper(F.substring(t, 1, 1)),
                    F.substring(F.concat(tail, F.lit("000")), 1, 3))
    return F.when(t == "", F.lit("")).otherwise(code)
