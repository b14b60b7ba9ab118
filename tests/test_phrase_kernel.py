"""Property tests for the phrase-match kernels (no Spark): the vectorized
searchsorted implementations must equal a brute-force per-doc reference for
random posting layouts, for slop=0 (exact) and slop>0 (anchor-displacement,
query/plan.py Phrase semantics)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_plugin_spark.query.executor import (_phrase_match,
                                                _phrase_match_sloppy)


def _decoded_from(docs):
    """docs: {doc_id: {term: [positions]}} -> per-term (ids, tfs, pos)."""
    terms = sorted({t for d in docs.values() for t in d})
    out = {}
    for t in terms:
        ids, tfs, pos = [], [], []
        for did in sorted(docs):
            ps = sorted(docs[did].get(t, []))
            if ps:
                ids.append(did)
                tfs.append(len(ps))
                pos.extend(ps)
        out[t] = (np.array(ids, np.int64), np.array(tfs, np.int64),
                  np.array(pos, np.int64))
    return out


def _brute(docs, terms, offsets, slop):
    """Reference: per doc, per anchor of terms[0], displacement = sum of
    per-term nearest-position distances; weight 1/(1+d) if d <= slop."""
    base = offsets[0]
    out = {}
    for did in sorted(docs):
        tok = docs[did]
        if any(not tok.get(t) for t in terms):
            continue
        w = 0.0
        for p0 in tok[terms[0]]:
            d = 0.0
            for t, off in zip(terms[1:], offsets[1:]):
                d += min(abs(p - (p0 + off - base)) for p in tok[t])
            if d <= slop:
                w += 1.0 / (1.0 + d)
        if w:
            out[did] = w
    return out


# docs strategy: up to 6 docs, positions in [0, 30), up to 3 terms present
_doc = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.sets(st.integers(min_value=0, max_value=29), min_size=1, max_size=6)
    .map(sorted),
    min_size=1, max_size=3)
_docs = st.dictionaries(st.integers(min_value=0, max_value=40), _doc,
                        min_size=1, max_size=6)


@given(_docs, st.sampled_from([["a", "b"], ["a", "b", "c"], ["b", "a"]]),
       st.integers(min_value=0, max_value=5))
@settings(max_examples=300, deadline=None)
def test_sloppy_matches_bruteforce(docs, terms, slop):
    # keep only docs containing every phrase term (the kernel only ever sees
    # candidate docs — _phrase_decode_selective intersects docID streams)
    docs = {d: tok for d, tok in docs.items()
            if all(tok.get(t) for t in terms)}
    offsets = list(range(len(terms)))
    decoded = _decoded_from(docs)
    for t in terms:
        decoded.setdefault(t, (np.empty(0, np.int64), np.empty(0, np.int64),
                               np.empty(0, np.int64)))
    ids, w = _phrase_match_sloppy(decoded, terms, offsets, slop)
    got = dict(zip(ids.tolist(), w.tolist()))
    want = _brute(docs, terms, offsets, slop)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])


@given(_docs, st.sampled_from([["a", "b"], ["a", "b", "c"]]))
@settings(max_examples=200, deadline=None)
def test_slop_zero_equals_exact_path(docs, terms):
    docs = {d: tok for d, tok in docs.items()
            if all(tok.get(t) for t in terms)}
    offsets = list(range(len(terms)))
    decoded = _decoded_from(docs)
    ids_e, tf_e = _phrase_match(decoded, terms, offsets)      # exact ints
    ids_s, w_s = _phrase_match_sloppy(decoded, terms, offsets, 0)
    assert ids_e.tolist() == ids_s.tolist()
    assert tf_e.astype(np.float64).tolist() == w_s.tolist()
