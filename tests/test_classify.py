"""lucene-classification module analogues (ops/classify.py): naive Bayes
against an exact hand computation of the documented formula, and the SimHash
kNN classifier against a brute-force Python vote over the engine's own
signatures.  Both emit float-free (id, pred) output by design.
"""

import math
from collections import Counter, defaultdict

import pytest

from lucene_plugin_spark.ops import classify as C
from lucene_plugin_spark.ops.dedup import simhash64


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, text string, cls string")


def _nb_expect(rows):
    """Exact Python mirror of naive_bayes_classify's documented formula."""
    toks = {r["id"]: set(r["text"].lower().split()) for r in rows}
    cls = {r["id"]: r["cls"] for r in rows}
    n = float(len(rows))
    classes = sorted({c for c in cls.values()})
    nd = Counter(cls.values())
    dfc: dict = defaultdict(float)
    for i, ts in toks.items():
        for w in ts:
            dfc[(w, cls[i])] += 1.0
    tot = defaultdict(float)
    for (w, c), v in dfc.items():
        tot[c] += v
    vocab = float(len({w for ts in toks.values() for w in ts}))
    out = {}
    for i, ts in toks.items():
        best = None
        for c in classes:
            s = math.log(nd[c] / n)
            for w in ts:
                s += math.log((dfc.get((w, c), 0.0) + 1.0) / (tot[c] + vocab))
            if best is None or s > best[0] + 1e-12 or (
                    abs(s - best[0]) <= 1e-12 and c < best[1]):
                best = (s, c)
        out[i] = best[1]
    return out


def test_naive_bayes_exact_formula(spark):
    rows = [
        {"id": 0, "text": "red apple sweet fruit", "cls": "fruit"},
        {"id": 1, "text": "green apple sour fruit tree", "cls": "fruit"},
        {"id": 2, "text": "yellow banana sweet fruit", "cls": "fruit"},
        {"id": 3, "text": "red fast car engine", "cls": "car"},
        {"id": 4, "text": "green slow car wheel engine", "cls": "car"},
        {"id": 5, "text": "sweet red fruit tree", "cls": "fruit"},
        {"id": 6, "text": "engine wheel fast", "cls": "car"},
    ]
    got = {r["id"]: r["pred"]
           for r in C.naive_bayes_classify(_df(spark, rows), "id", "text",
                                           "cls").collect()}
    assert got == _nb_expect(rows)
    # and the argmax is discriminative on held-in docs
    assert got[0] == "fruit" and got[3] == "car"


def test_naive_bayes_salted_separability(spark):
    # a per-class marker token must dominate an otherwise-shared vocabulary
    shared = "alpha beta gamma delta epsilon"
    rows = [{"id": i, "text": f"{shared} mk{'x' if i % 2 else 'y'}",
             "cls": "x" if i % 2 else "y"} for i in range(40)]
    got = {r["id"]: r["pred"]
           for r in C.naive_bayes_classify(_df(spark, rows), "id", "text",
                                           "cls").collect()}
    assert all(got[i] == ("x" if i % 2 else "y") for i in range(40))


def test_knn_simhash_vs_bruteforce(spark):
    # clustered corpus: three families of near-identical docs
    fam = {
        "a": "spark join merge shuffle partition broadcast hash table scan",
        "b": "stream window watermark state trigger sink source batch",
        "c": "parquet column footer rowgroup page dictionary encoding",
    }
    rows = []
    for i in range(60):
        f = "abc"[i % 3]
        # small per-doc perturbation keeps signatures near but distinct
        rows.append({"id": i, "text": fam[f] + f" tok{i // 3}",
                     "cls": f})
    df = _df(spark, rows)
    k, radius = 5, 14
    got = {r["id"]: r["pred"]
           for r in C.knn_classify_simhash(df, "id", "text", "cls", k=k,
                                           max_hamming=radius).collect()}
    # brute-force mirror over the engine's own signatures
    sig = {r["id"]: r["simhash"]
           for r in simhash64(df, "id", "text").collect()}
    cls = {r["id"]: r["cls"] for r in rows}
    want = {}
    for i in sig:
        nbrs = sorted(
            ((bin(sig[i] ^ sig[j]).count("1"), j) for j in sig if j != i))
        nbrs = [(h, j) for h, j in nbrs if h <= radius][:k]
        if not nbrs:
            continue
        votes = Counter(cls[j] for _, j in nbrs)
        top = max(votes.values())
        want[i] = sorted(c for c, v in votes.items() if v == top)[0]
    assert got == want
    # families are recovered for every classified doc
    assert all(got[i] == cls[i] for i in got)


def test_knn_no_neighbor_dropped(spark):
    rows = [
        {"id": 0, "text": "aaa bbb ccc ddd eee", "cls": "x"},
        {"id": 1, "text": "aaa bbb ccc ddd eee", "cls": "x"},
        {"id": 2, "text": ("zzz yyy xxx www vvv uuu ttt sss rrr qqq "
                           "ppp ooo nnn mmm lll"), "cls": "y"},
    ]
    out = C.knn_classify_simhash(_df(spark, rows), "id", "text", "cls",
                                 k=3, max_hamming=2)
    got = {r["id"]: r["pred"] for r in out.collect()}
    # the outlier has no neighbour within radius 2 -> no prediction row
    assert set(got) == {0, 1} and got[0] == "x" and got[1] == "x"
