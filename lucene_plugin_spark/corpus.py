"""Deterministic synthetic source-code corpus (FIXTURES.md §1c).

Seeded (default 42) generator of ``docs(repo, path, commit, lang, content)``
rows shaped like source code: camelCase / snake_case identifiers, acronym
runs, keywords, Zipf-distributed token frequencies (hot, skewed terms — the
salting/efficiency stressor), langs in {java, py, js, go}, repos
repo-00..repo-07.  Pure numpy; generation order is fixed so docIDs, scores
and tie-breaks are reproducible everywhere.
"""

from __future__ import annotations

import numpy as np

_STEMS = [
    "get", "set", "user", "name", "index", "query", "parse", "token", "http",
    "server", "client", "read", "write", "buffer", "stream", "merge", "block",
    "score", "match", "field", "value", "cache", "commit", "search", "doc",
    "term", "list", "hash", "join", "sort", "filter", "count", "batch",
    "shard", "segment", "offset", "byte", "codec", "util", "string",
]
_KEYWORDS = ["return", "import", "class", "def", "void", "public", "static",
             "func", "var", "let", "const", "new", "null", "true", "false"]
_LANGS = ["java", "py", "js", "go"]
_EXT = {"java": "java", "py": "py", "js": "js", "go": "go"}


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def generate_rows(n_docs: int, seed: int = 42,
                  tokens_per_doc: tuple[int, int] = (30, 120)) -> list[dict]:
    """Return n_docs dicts (repo, path, commit, lang, content), deterministic."""
    rng = np.random.default_rng(seed)
    n_stems = len(_STEMS)
    zipf = _zipf_probs(n_stems)
    kw_probs = _zipf_probs(len(_KEYWORDS), 1.3)
    rows = []
    for i in range(n_docs):
        lang = _LANGS[i % len(_LANGS)]
        repo = f"repo-{i % 8:02d}"
        nt = int(rng.integers(tokens_per_doc[0], tokens_per_doc[1]))
        stem_idx = rng.choice(n_stems, size=2 * nt, p=zipf)
        parts = []
        j = 0
        while len(parts) < nt:
            r = rng.random()
            if r < 0.25:
                parts.append(_KEYWORDS[int(rng.choice(len(_KEYWORDS), p=kw_probs))])
            elif r < 0.55:  # camelCase pair
                a, b = _STEMS[stem_idx[j]], _STEMS[stem_idx[j + 1]]
                parts.append(a + b.capitalize())
                j += 2
            elif r < 0.75:  # snake_case pair
                parts.append(_STEMS[stem_idx[j]] + "_" + _STEMS[stem_idx[j + 1]])
                j += 2
            elif r < 0.9:
                parts.append(_STEMS[stem_idx[j]])
                j += 1
            else:  # acronym / literal-ish
                parts.append(_STEMS[stem_idx[j]].upper() + str(int(rng.integers(0, 100))))
                j += 1
            if j > 2 * nt - 2:
                stem_idx = rng.choice(n_stems, size=2 * nt, p=zipf)
                j = 0
        rows.append({
            "repo": repo,
            "path": f"src/f{i:06d}.{_EXT[lang]}",
            "commit": "c0ffee42",
            "lang": lang,
            "content": " ".join(parts),
        })
    return rows


def corpus_df(spark, n_docs: int, seed: int = 42):
    rows = generate_rows(n_docs, seed)
    return spark.createDataFrame(rows).select("repo", "path", "commit", "lang", "content")


def corpus_df_distributed(spark, n_docs: int, seed: int = 42,
                          tokens_per_doc: tuple[int, int] = (30, 120)):
    """Executor-side corpus generation for large scaling runs: each partition
    generates its id range with vectorized numpy (seeded per partition ->
    deterministic for a fixed partition count)."""
    import pandas as pd
    par = max(spark.sparkContext.defaultParallelism, 8)
    ids = spark.range(0, n_docs, 1, par)

    def gen(batches):
        for pdf in batches:
            rng = np.random.default_rng(seed + int(pdf["id"].iloc[0]))
            n = len(pdf)
            zipf = _zipf_probs(len(_STEMS))
            nt = rng.integers(tokens_per_doc[0], tokens_per_doc[1], size=n)
            total = int(nt.sum())
            stems = np.array(_STEMS, dtype=object)[rng.choice(len(_STEMS), size=2 * total, p=zipf)]
            kws = np.array(_KEYWORDS, dtype=object)[rng.choice(len(_KEYWORDS), size=total)]
            shape = rng.random(total)
            caps = np.char.capitalize(stems[total:2 * total].astype(str)).astype(object)
            toks = np.where(shape < 0.25, kws,
                   np.where(shape < 0.55, stems[:total] + caps,
                   np.where(shape < 0.75, stems[:total] + "_" + stems[total:2 * total],
                            stems[:total])))
            ends = np.cumsum(nt)
            starts = ends - nt
            i = pdf["id"].to_numpy()
            lang = np.array(_LANGS, dtype=object)[i % len(_LANGS)]
            ext = np.array([_EXT[l] for l in lang], dtype=object)
            yield pd.DataFrame({
                "repo": np.array([f"repo-{x % 8:02d}" for x in i], dtype=object),
                "path": np.array([f"src/f{x:08d}." for x in i], dtype=object) + ext,
                "commit": "c0ffee42",
                "lang": lang,
                "content": [" ".join(toks[s:e]) for s, e in zip(starts, ends)],
            })

    return ids.mapInPandas(
        gen, schema="repo string, path string, commit string, lang string, content string")


QUERY_SET = [
    # (name, query) — the "reference query set" for rank-identity gating:
    # every syntax family the reference exercises (SURVEY.md §2.4) over the
    # synthetic code corpus, plus north-rule phrase/boolean coverage.
    ("term_hot", "get"),
    ("term_mid", "segment"),
    ("term_camel", "getUserName"),
    ("or_2", "index query"),
    ("or_4", "merge block score cache"),
    ("and_2", "parse AND token"),
    ("and_not", "search -commit"),
    ("must_plus", "+index +query cache"),
    ("phrase_2", '"user name"'),
    ("phrase_3", '"get user name"'),
    ("range", "[se TO st]"),
    ("grouped", "(merge OR block) AND stream"),
    ("wildcard", "se*ent"),
    ("prefix", "quer*"),
    ("fuzzy", "segment~1"),
    ("boost_term", "index^2 query"),
    ("boost_phrase", '"user name"^3 cache'),
    ("boost_range", "[se TO st]^2 merge"),
    ("phrase_slop1", '"user name"~1'),
    ("phrase_slop2", '"get name"~2'),
    ("phrase_slop3", '"index cache"~3'),
    ("slop_boost", '"query cache"~2^2 merge'),
    ("range_excl", "{se TO st}"),
    ("range_mixed", "[se TO st}"),
    ("regexp", "/se(gment|rver)/"),
    ("regexp_mixed", "/qu.*/ merge"),
]
