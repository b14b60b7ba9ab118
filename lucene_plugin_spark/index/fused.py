"""Fused tokenize -> compressed-segment kernel (zero-shuffle index build).

The heart of the scale story.  docIDs are assigned in (repo, path) order, so
every docs_meta partition file holds a *contiguous* docID range, i.e. one
doc-slice (``dslice = doc_id // docs_per_slice``).  That makes the entire
write side of the index a single map pass:

    docs_meta scan (one whole file per task, session.py)
      -> mapInArrow(fused kernel):  tokenize -> sort -> posting runs ->
         compressed blocks (+ per-slice norms rows)
      -> parquet write partitioned by dslice        (NO shuffle)

All derived tables are then cheap columnar jobs over the segments table:
``term_dict`` is a groupBy over per-block (doc_count, tf_sum); the flat
postings table and norms sidecars are vectorized *decodes* of the blocks,
again one-task-per-file with no shuffle.  Compare the reference, where the
analogous pipeline is Lucene's IndexWriter + TieredMergePolicy segment
machinery (LuceneIndexBean.java:664-691) on a single node.

Everything here is numpy/Arrow vectorized: token streams are int32
dictionary codes (analysis/tokenizer.py), posting-run detection is boolean
index math, per-block codec output is sliced out of ONE varint stream per
slice via byte offsets (codec.varint_encode_with_offsets) — no per-posting
or per-block Python arithmetic, which is what keeps per-task cost flat as
task concurrency rises (memory-bandwidth discipline = scaling efficiency).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_plugin_spark.analysis.tokenizer import tokenize_codes
from lucene_plugin_spark.index import codec

#: sentinel "term" for per-slice norms rows ('' can never be a real token —
#: empty strings are filtered during analysis) — sorts before every term, so
#: norms rows sit at the head of each slice file's row order.
NORMS_TERM = ""

SEGMENT_DDL = (
    "field string, term string, dslice int, block_id int, doc_count int, "
    "first_doc long, last_doc long, doc_gaps binary, tfs binary, "
    "positions binary, pos_lens_ok int, block_max_tf int, block_min_dl long, "
    "tf_sum long"
)
_SEG_COLS = [f.split(" ")[0] for f in SEGMENT_DDL.split(", ")]

FLAT_DDL = ("field string, term string, doc_id long, tf int, dl long, "
            "positions array<int>")

NORMS_DDL = "dslice int, field string, doc_id long, dl long"


# --------------------------------------------------------------------- build
def _first_value_per_key(doc_ids: np.ndarray, fields_cells: list):
    """Explode map-field cells -> {field: ([doc_id], [value])} keeping only
    the FIRST value per (doc, key) — reference indexMap semantics
    (LuceneIndexBean.java:338-341)."""
    out: dict[str, tuple[list, list]] = {}
    for i, cell in enumerate(fields_cells):
        if not cell:
            continue
        seen = set()
        for k, v in cell:
            if k in seen or v is None:
                continue
            seen.add(k)
            d, vals = out.setdefault(k, ([], []))
            d.append(int(doc_ids[i]))
            vals.append(v)
    return out


def _field_block_arrays(field: str, dslice: int, doc_ids: np.ndarray,
                        values, block_size: int,
                        analyzer: str = "standard"):
    """Build compressed posting blocks + the norms row for one (slice, field).

    Returns a dict of column lists (SEGMENT_DDL order) or None if the field
    tokenizes to nothing.
    """
    row, code, pos, vocab = tokenize_codes(values, variant=analyzer)
    if len(row) == 0:
        return None
    doc = doc_ids[row]
    dl_per_row = np.bincount(row, minlength=len(values)).astype(np.int64)
    # lexicographic term ranks so file row order == term order (row-group
    # min/max stats then prune non-query terms inside every slice file)
    rank_order = pc.sort_indices(vocab).to_numpy().astype(np.int64)
    rank = np.empty(len(vocab), np.int64)
    rank[rank_order] = np.arange(len(vocab), dtype=np.int64)
    sorted_vocab = vocab.take(pa.array(rank_order, type=pa.int64()))
    r = rank[code]
    order = np.lexsort((pos, doc, r))
    r_s, doc_s, pos_s, row_s = r[order], doc[order], pos[order], row[order]

    # posting runs: one per (term, doc)
    nb = np.ones(len(r_s), dtype=bool)
    nb[1:] = (r_s[1:] != r_s[:-1]) | (doc_s[1:] != doc_s[:-1])
    rs = np.flatnonzero(nb)
    tf = np.diff(np.append(rs, len(r_s))).astype(np.int64)
    run_term = r_s[rs]
    run_doc = doc_s[rs]
    run_dl = dl_per_row[row_s[rs]]

    # blocks: consecutive runs of one term, block_size runs per block
    term_change = np.ones(len(rs), dtype=bool)
    term_change[1:] = run_term[1:] != run_term[:-1]
    term_first = np.flatnonzero(term_change)
    run_ord = np.arange(len(rs), dtype=np.int64) - term_first[np.cumsum(term_change) - 1]
    blk = run_ord // block_size
    new_block = np.ones(len(rs), dtype=bool)
    new_block[1:] = term_change[1:] | (blk[1:] != blk[:-1])
    bs = np.flatnonzero(new_block)
    be = np.append(bs[1:], len(rs))

    doc_count = (be - bs).astype(np.int32)
    first_doc = run_doc[bs]
    last_doc = run_doc[be - 1]
    block_max_tf = np.maximum.reduceat(tf, bs).astype(np.int32)
    block_min_dl = np.minimum.reduceat(run_dl, bs)
    tf_sum = np.add.reduceat(tf, bs)
    block_id = blk[bs].astype(np.int32)

    # one varint stream per codec column, sliced per block by byte offsets
    gaps = np.empty_like(run_doc)
    gaps[0] = run_doc[0]
    np.subtract(run_doc[1:], run_doc[:-1], out=gaps[1:])
    gaps[bs] = run_doc[bs]  # absolute docID at each block start
    gbuf, goff = codec.varint_encode_with_offsets(gaps)
    tbuf, toff = codec.varint_encode_with_offsets(tf)
    pgaps = np.empty_like(pos_s)
    pgaps[0] = pos_s[0]
    np.subtract(pos_s[1:], pos_s[:-1], out=pgaps[1:])
    pgaps[rs] = pos_s[rs]  # absolute position at each run (=posting) start
    pbuf, poff = codec.varint_encode_with_offsets(pgaps)
    tok_bs = rs[bs]  # first token index of each block
    tok_be = np.append(tok_bs[1:], len(pos_s))
    gb, tb, pb = gbuf.tobytes(), tbuf.tobytes(), pbuf.tobytes()

    n_blocks = len(bs)
    terms = sorted_vocab.take(pa.array(run_term[bs], type=pa.int64())).to_pylist()

    # norms: per-doc dl for this (slice, field), one compressed row
    u_doc, u_idx = np.unique(run_doc, return_index=True)
    u_dl = run_dl[u_idx]

    return {
        "field": [field] * (n_blocks + 1),
        "term": [NORMS_TERM] + terms,
        "dslice": [dslice] * (n_blocks + 1),
        "block_id": [0] + block_id.tolist(),
        "doc_count": [len(u_doc)] + doc_count.tolist(),
        "first_doc": [int(u_doc[0])] + first_doc.tolist(),
        "last_doc": [int(u_doc[-1])] + last_doc.tolist(),
        "doc_gaps": [codec.encode_ids(u_doc)]
                    + [gb[goff[a]:goff[b]] for a, b in zip(bs, be)],
        "tfs": [codec.varint_encode(u_dl.astype(np.uint64))]
               + [tb[toff[a]:toff[b]] for a, b in zip(bs, be)],
        "positions": [b""] + [pb[poff[a]:poff[b]] for a, b in zip(tok_bs, tok_be)],
        "pos_lens_ok": [0] + [1] * n_blocks,
        "block_max_tf": [0] + block_max_tf.tolist(),
        "block_min_dl": [0] + block_min_dl.tolist(),
        "tf_sum": [0] + tf_sum.tolist(),
    }


def make_fused_segment_kernel(docs_per_slice: int, block_size: int,
                              analyzer: str = "standard"):
    """mapInArrow generator: (dslice, doc_id, content [, fields]) batches ->
    SEGMENT_DDL record batches.  Buffers its partition (bounded: a partition
    is one docs_meta slice file, docs_per_slice docs at most)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        got = list(batches)
        if not got:
            return
        tbl = pa.Table.from_batches(got).combine_chunks()
        if tbl.num_rows == 0:
            return
        dslice_np = tbl.column("dslice").to_numpy().astype(np.int64)
        doc_np = tbl.column("doc_id").to_numpy().astype(np.int64)
        content = tbl.column("content")
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        fields_col = tbl.column("fields") if "fields" in tbl.column_names else None
        if fields_col is not None and isinstance(fields_col, pa.ChunkedArray):
            fields_col = fields_col.combine_chunks()

        for ds in np.unique(dslice_np):
            idx = np.flatnonzero(dslice_np == ds)
            take = pa.array(idx, type=pa.int64())
            sub_docs = doc_np[idx]
            per_field: dict[str, tuple[np.ndarray, object]] = {
                "text": (sub_docs, content.take(take))}
            if fields_col is not None:
                cells = fields_col.take(take).to_pylist()
                if any(cells):
                    for fname, (d, vals) in _first_value_per_key(sub_docs, cells).items():
                        per_field[fname] = (np.asarray(d, dtype=np.int64),
                                            pa.array(vals, type=pa.string()))
            cols: dict[str, list] = {c: [] for c in _SEG_COLS}
            for fname in sorted(per_field):
                d, vals = per_field[fname]
                block_cols = _field_block_arrays(fname, int(ds), d, vals,
                                                 block_size, analyzer)
                if block_cols is None:
                    continue
                for c in _SEG_COLS:
                    cols[c].extend(block_cols[c])
            if not cols["field"]:
                continue
            yield pa.RecordBatch.from_pydict({
                "field": pa.array(cols["field"], type=pa.string()),
                "term": pa.array(cols["term"], type=pa.string()),
                "dslice": pa.array(cols["dslice"], type=pa.int32()),
                "block_id": pa.array(cols["block_id"], type=pa.int32()),
                "doc_count": pa.array(cols["doc_count"], type=pa.int32()),
                "first_doc": pa.array(cols["first_doc"], type=pa.int64()),
                "last_doc": pa.array(cols["last_doc"], type=pa.int64()),
                "doc_gaps": pa.array(cols["doc_gaps"], type=pa.binary()),
                "tfs": pa.array(cols["tfs"], type=pa.binary()),
                "positions": pa.array(cols["positions"], type=pa.binary()),
                "pos_lens_ok": pa.array(cols["pos_lens_ok"], type=pa.int32()),
                "block_max_tf": pa.array(cols["block_max_tf"], type=pa.int32()),
                "block_min_dl": pa.array(cols["block_min_dl"], type=pa.int64()),
                "tf_sum": pa.array(cols["tf_sum"], type=pa.int64()),
            })

    return gen


# -------------------------------------------------------------------- decode
def _concat_binary(col: pa.Array) -> bytes:
    return b"".join(col.to_pylist())


def decode_flat_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """Vectorized decode: segment blocks -> flat postings
    (field, term, doc_id, tf, dl, positions).  One varint_decode per stream
    per task — per-block Python is just byte-slicing at encode time and
    nothing at decode time."""
    got = list(batches)
    if not got:
        return
    tbl = pa.Table.from_batches(got).combine_chunks()
    if tbl.num_rows == 0:
        return
    term_col = tbl.column("term")
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    is_norm = pc.equal(term_col, NORMS_TERM).to_numpy(zero_copy_only=False).astype(bool)

    # norms lookup per field (doc ids across slices in a task are disjoint)
    norm_lookup: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    nidx = np.flatnonzero(is_norm)
    if len(nidx):
        ntbl = tbl.take(pa.array(nidx, type=pa.int64()))
        nfields = ntbl.column("field").to_pylist()
        ngaps = ntbl.column("doc_gaps").to_pylist()
        ndls = ntbl.column("tfs").to_pylist()
        acc: dict[str, tuple[list, list]] = {}
        for f, g, d in zip(nfields, ngaps, ndls):
            ids = codec.decode_ids(g)
            dls = codec.varint_decode(d).astype(np.int64)
            a = acc.setdefault(f, ([], []))
            a[0].append(ids)
            a[1].append(dls)
        for f, (ids_l, dls_l) in acc.items():
            ids = np.concatenate(ids_l)
            dls = np.concatenate(dls_l)
            o = np.argsort(ids, kind="mergesort")
            norm_lookup[f] = (ids[o], dls[o])

    pidx = np.flatnonzero(~is_norm)
    if not len(pidx):
        return
    ptbl = tbl.take(pa.array(pidx, type=pa.int64()))
    counts = ptbl.column("doc_count").to_numpy().astype(np.int64)
    offs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    total = int(offs[-1])

    # docIDs: one decode of the concatenated gap stream, reset per block
    gaps = codec.varint_decode(_concat_binary(ptbl.column("doc_gaps"))).astype(np.int64)
    acc_ = np.cumsum(gaps)
    base = np.zeros_like(gaps)
    starts = offs[:-1]
    base[starts[1:]] = acc_[starts[1:] - 1]
    doc_ids = acc_ - np.maximum.accumulate(base)
    tfs = codec.varint_decode(_concat_binary(ptbl.column("tfs"))).astype(np.int64)
    positions = codec.decode_positions(_concat_binary(ptbl.column("positions")), tfs)

    rep = pa.array(np.repeat(np.arange(len(counts), dtype=np.int64), counts))
    field_out = ptbl.column("field").combine_chunks().take(rep)
    term_out = ptbl.column("term").combine_chunks().take(rep)
    fields_np = ptbl.column("field").to_pylist()
    dl = np.zeros(total, dtype=np.int64)
    # per-field dl gather (few distinct fields per corpus)
    field_rep = np.repeat(np.asarray(fields_np, dtype=object), counts)
    for f, (nids, ndls) in norm_lookup.items():
        m = field_rep == f
        if m.any():
            dl[m] = ndls[np.searchsorted(nids, doc_ids[m])]
    pos_offsets = np.concatenate([[0], np.cumsum(tfs)]).astype(np.int32)
    pos_list = pa.ListArray.from_arrays(pa.array(pos_offsets, type=pa.int32()),
                                        pa.array(positions.astype(np.int32),
                                                 type=pa.int32()))
    yield pa.RecordBatch.from_pydict({
        "field": field_out,
        "term": term_out,
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "tf": pa.array(tfs.astype(np.int32), type=pa.int32()),
        "dl": pa.array(dl, type=pa.int64()),
        "positions": pos_list,
    })


def decode_norms_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """Segment norms rows -> (dslice, field, doc_id, dl) rows."""
    got = list(batches)
    if not got:
        return
    tbl = pa.Table.from_batches(got).combine_chunks()
    if tbl.num_rows == 0:
        return
    fields = tbl.column("field").to_pylist()
    dslices = tbl.column("dslice").to_numpy().astype(np.int64)
    gaps = tbl.column("doc_gaps").to_pylist()
    dls = tbl.column("tfs").to_pylist()
    f_out, ds_out, id_out, dl_out = [], [], [], []
    for f, ds, g, d in zip(fields, dslices, gaps, dls):
        ids = codec.decode_ids(g)
        dl = codec.varint_decode(d).astype(np.int64)
        f_out.extend([f] * len(ids))
        ds_out.append(np.full(len(ids), ds, dtype=np.int32))
        id_out.append(ids)
        dl_out.append(dl)
    if not id_out:
        return
    yield pa.RecordBatch.from_pydict({
        "dslice": pa.array(np.concatenate(ds_out), type=pa.int32()),
        "field": pa.array(f_out, type=pa.string()),
        "doc_id": pa.array(np.concatenate(id_out), type=pa.int64()),
        "dl": pa.array(np.concatenate(dl_out), type=pa.int64()),
    })
