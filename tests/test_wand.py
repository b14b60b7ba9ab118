"""Block-max WAND pruning (SURVEY.md §4 P6): the pruned path must (a) return
exactly the exhaustive path's top-k and (b) actually skip decoding tf streams
of low-upper-bound blocks."""

import numpy as np
import pandas as pd
import pytest

from lucene_plugin_spark.index import codec
from lucene_plugin_spark.query import bm25
from lucene_plugin_spark.query.executor import _score_slice, _score_slice_wand


def _mk_slice(rng, n_docs=20000, terms=("alpha", "beta", "gamma"), block=64):
    """Synthesize one doc-slice's segment blocks + norms for given terms."""
    rows = {k: [] for k in ("field", "term", "dslice", "block_id", "doc_count",
                            "first_doc", "last_doc", "doc_gaps", "tfs",
                            "positions", "pos_lens_ok", "block_max_tf",
                            "block_min_dl")}
    dls = rng.integers(20, 200, size=n_docs).astype(np.int64)
    avgdl = float(dls.mean())
    df_map = {}
    for t_i, term in enumerate(terms):
        df = int(n_docs * (0.5 if t_i == 0 else 0.08))
        ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 8, size=df).astype(np.int64)
        df_map[("text", term)] = float(df)
        for b0 in range(0, df, block):
            b1 = min(b0 + block, df)
            bids, btf = ids[b0:b1], tfs[b0:b1]
            bdl = dls[bids].astype(np.float64)
            rows["field"].append("text")
            rows["term"].append(term)
            rows["dslice"].append(0)
            rows["block_id"].append(b0 // block)
            rows["doc_count"].append(b1 - b0)
            rows["first_doc"].append(int(bids[0]))
            rows["last_doc"].append(int(bids[-1]))
            rows["doc_gaps"].append(codec.encode_ids(bids))
            rows["tfs"].append(codec.varint_encode(btf.astype(np.uint64)))
            rows["positions"].append(b"")
            rows["pos_lens_ok"].append(0)
            rows["block_max_tf"].append(int(btf.max()))
            rows["block_min_dl"].append(int(bdl.min()))
    sl = pd.DataFrame(rows)
    norms = pd.DataFrame({"field": "text", "doc_id": np.arange(n_docs),
                          "dl": dls})
    stats = {"text": (float(n_docs), avgdl)}
    return sl, norms, df_map, stats


@pytest.mark.parametrize("k", [10, 100])
def test_wand_equals_exhaustive_and_prunes(k):
    rng = np.random.default_rng(42)
    sl, norms, df_map, stats = _mk_slice(rng)
    specs = [{"kind": "term", "field": "text", "terms": [t], "offsets": None,
              "leaf_id": i, "polarity": "should"}
             for i, t in enumerate(("alpha", "beta", "gamma"))]
    counters = {}
    got = _score_slice_wand(sl, norms, specs, df_map, stats, None, k,
                            stats_out=counters)
    want = _score_slice(sl, norms, specs, df_map, stats, None, k, False)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(got["score"].to_numpy(), want["score"].to_numpy(),
                       rtol=1e-12)
    assert counters["tf_blocks_decoded"] < counters["tf_blocks_total"], (
        f"no pruning: {counters}")


def test_wand_respects_doc_ranges():
    rng = np.random.default_rng(7)
    sl, norms, df_map, stats = _mk_slice(rng, n_docs=2000)
    specs = [{"kind": "term", "field": "text", "terms": ["alpha"], "offsets": None,
              "leaf_id": 0, "polarity": "should"}]
    ranges = [(100, 400), (900, 1100)]
    got = _score_slice_wand(sl, norms, specs, df_map, stats, ranges, 50)
    want = _score_slice(sl, norms, specs, df_map, stats, ranges, 50, False)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    for d in got["doc_id"]:
        assert any(lo <= d <= hi for lo, hi in ranges)


def test_single_term_fast_path_tie_break():
    """Many docs tie at the k-th score: the fast path must keep the exact
    (score desc, doc_id asc) Lucene tie-break, same as the exhaustive path."""
    rng = np.random.default_rng(5)
    n_docs = 5000
    dls = np.full(n_docs, 100, dtype=np.int64)     # equal dl
    ids = np.arange(n_docs, dtype=np.int64)
    tfs = np.ones(n_docs, dtype=np.int64)          # equal tf -> all scores tie
    tfs[::7] = 3                                   # a few higher-scoring docs
    rows = {k: [] for k in ("field", "term", "dslice", "block_id", "doc_count",
                            "first_doc", "last_doc", "doc_gaps", "tfs",
                            "positions", "pos_lens_ok", "block_max_tf",
                            "block_min_dl")}
    block = 128
    for b0 in range(0, n_docs, block):
        b1 = min(b0 + block, n_docs)
        bids, btf = ids[b0:b1], tfs[b0:b1]
        rows["field"].append("text"); rows["term"].append("t")
        rows["dslice"].append(0); rows["block_id"].append(b0 // block)
        rows["doc_count"].append(b1 - b0)
        rows["first_doc"].append(int(bids[0])); rows["last_doc"].append(int(bids[-1]))
        rows["doc_gaps"].append(codec.encode_ids(bids))
        rows["tfs"].append(codec.varint_encode(btf.astype(np.uint64)))
        rows["positions"].append(b""); rows["pos_lens_ok"].append(0)
        rows["block_max_tf"].append(int(btf.max()))
        rows["block_min_dl"].append(100)
    sl = pd.DataFrame(rows)
    norms = pd.DataFrame({"field": "text", "doc_id": ids, "dl": dls})
    stats = {"text": (float(n_docs), 100.0)}
    df_map = {("text", "t"): float(n_docs)}
    specs = [{"kind": "term", "field": "text", "terms": ["t"], "offsets": None,
              "leaf_id": 0, "polarity": "should"}]
    for k in (10, 100, 1000):
        fast = _score_slice_wand(sl, norms, specs, df_map, stats, None, k)
        slow = _score_slice(sl, norms, specs, df_map, stats, None, k, False)
        assert fast["doc_id"].tolist() == slow["doc_id"].tolist(), k
        assert np.allclose(fast["score"], slow["score"]), k
