"""Inverted-index build pipeline (the analogue of Lucene's IndexWriter path,
LuceneIndexBean.java:664-691 + indexStream :230-277, rebuilt Spark-first).

Stages (each snapshot-committed, checkpoint-resumable via stage fingerprints):

1. ``docs``       — source table (repo, path, commit, lang, content [+fields])
                    + content_sha256 (per-row invariant from input_hint).
2. ``docs_meta``  — deterministic dense docIDs: range-partition by (repo,path),
                    sort within partitions, offset-prefix-sum assignment
                    (reproducible tie-breaks, SURVEY.md §2.7.5).
3. derived tables — ``doc_norms``/``field_lens`` (per-doc lengths, decoded
                    from per-slice norms rows), ``term_dict`` (columnar agg
                    over block metadata), ``stats`` (n_docs, sum_dl, avgdl).
                    There is NO materialized flat-postings table: segments
                    are the single durable postings store, and flat postings
                    are derived on demand via :func:`flat_postings_view`
                    (term/slice-filtered decode).
4. ``segments``   — compressed posting blocks, **partitioned by doc-range**
                    (``dslice``), term-sorted within each file so parquet
                    row-group stats prune non-query terms.  Doc-range
                    sharding is the layout that scales: every shard holds all
                    terms for its doc range, so block-max WAND top-k runs
                    independently per shard with no cross-shard traffic, and
                    hot (skewed) terms are automatically spread across all
                    shards — the skew-salting of the build groupBy falls out
                    of grouping by (dslice) instead of (term).

Scale notes (100 TB / 1000 executors): every stage is a constant number of
shuffles — docID assignment (1 range shuffle), flat postings (1 hash shuffle
on (field,term,doc_id)), segments (1 hash shuffle on dslice).  No driver-side
loops over data; the only ``collect()`` is the per-partition row-count array
(one int per partition) for docID offsets.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

from lucene_plugin_spark.analysis.tokenizer import tokenize_series
from lucene_plugin_spark.index import codec
from lucene_plugin_spark.query import bm25
from lucene_plugin_spark.storage.catalog import Catalog

BLOCK_SIZE = 128  # postings per compressed block (Lucene uses 128 in its FOR blocks)

TOKENS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("field", StringType()),
    StructField("term", StringType()),
    StructField("pos", IntegerType()),
])

SEGMENT_SCHEMA = StructType([
    StructField("field", StringType()),
    StructField("term", StringType()),
    StructField("dslice", IntegerType()),
    StructField("block_id", IntegerType()),
    StructField("doc_count", IntegerType()),
    StructField("first_doc", LongType()),
    StructField("last_doc", LongType()),
    StructField("doc_gaps", BinaryType()),
    StructField("tfs", BinaryType()),
    StructField("positions", BinaryType()),
    StructField("pos_lens_ok", IntegerType()),  # 1 if positions stream present
    # WAND bound components: ub(block) = idf * tf_norm(block_max_tf,
    # block_min_dl, CURRENT avgdl) — tf_norm is monotone increasing in tf and
    # decreasing in dl, so this upper-bounds every doc in the block for ANY
    # avgdl (stored scores would go stale when mutations shift avgdl)
    StructField("block_max_tf", IntegerType()),
    StructField("block_min_dl", LongType()),
    # per-block sum of tfs: term_dict's cf becomes a columnar agg over
    # segments (no flat-postings scan needed)
    StructField("tf_sum", LongType()),
])


@dataclass
class BuildResult:
    n_docs: int
    docs_snapshot: int
    segments_snapshot: int


class IndexBuilder:
    """Builds/refreshes the full index for a corpus into a Catalog.

    ``docs_per_slice`` bounds the rows a single segment-build task sees
    (memory ceiling per task at any corpus size); ``n_slices`` is derived.
    """

    def __init__(self, spark: SparkSession, catalog: Catalog,
                 docs_per_slice: int = 250_000, block_size: int = BLOCK_SIZE,
                 doc_buckets: int | None = None, analyzer: str = "standard",
                 index_sort: list[str] | None = None):
        self.spark = spark
        self.catalog = catalog
        self.docs_per_slice = docs_per_slice
        self.block_size = block_size
        #: (repo, kb) layout width of the docs table.  None (default) =
        #: adaptive: ingest sizes it to ~BUCKET_TARGET_DOCS docs per bucket,
        #: so tiny corpora don't pay a 100 TB layout's per-partition commit
        #: overhead and huge corpora keep mutations O(batch).  Once a docs
        #: table exists its persisted ``doc_buckets`` property is the source
        #: of truth — mutations must hash exactly like the layout on disk.
        self.doc_buckets = doc_buckets
        #: analysis-chain variant (tokenizer.ANALYZER_VARIANTS); persisted on
        #: the segments snapshot so SearchEngine analyzes queries identically
        self.analyzer = analyzer
        #: index-time sort (IndexWriterConfig.setIndexSort analogue): docIDs
        #: are assigned in (index_sort..., repo, path) order, so docID order
        #: IS sort order and a sorted top-k can early-terminate (Lucene's
        #: TopFieldCollector early termination on sorted segments).  Columns
        #: must exist on the source frame.  Persisted on the segments
        #: snapshot; (repo, path) stays the tie-break so ids remain
        #: deterministic and mutations keep their key semantics.
        self.index_sort = list(index_sort) if index_sort else None
        self.stage_times: dict[str, float] = {}

    # ------------------------------------------------------------------ docs
    #: adaptive layout target: one key bucket per ~this many docs (the
    #: mutation rewrite unit, aligned with the docs_per_slice default)
    BUCKET_TARGET_DOCS = 250_000
    #: adaptive layout cap (10^12 docs -> 4096 buckets x repo partitioning
    #: still bounds a bucket rewrite to ~repo_size/4096)
    BUCKET_MAX = 4096

    def _bucket_count(self) -> int | None:
        """Effective (repo, kb) bucket count, or None if not yet decided.
        Resolution order: persisted docs-table property (the on-disk layout
        is the truth — mutations must hash exactly like it) > explicit
        constructor value > None (ingest will pick adaptively)."""
        t = self.catalog.table("docs")
        if t.exists():
            p = t.snapshot().properties.get("doc_buckets")
            if p:
                return int(p)
        return self.doc_buckets

    def key_bucket(self, repo_col, path_col):
        """Deterministic key bucket for the docs table layout: mutations
        rewrite only the buckets their keys hash into (O(batch), not O(N))."""
        n = self._bucket_count() or 8
        return F.pmod(F.hash(repo_col, path_col), F.lit(n)).cast("int")

    def ingest_docs(self, source: DataFrame, fields_map_col: str | None = None) -> int:
        """Stage 1: persist the source corpus + sha256 invariant column.

        Layout: hive-partitioned by (repo, kb) — collection + key-hash bucket.
        ``clear(repo)`` is then a metadata-only partition drop (the Iceberg
        partition-level DELETE, reference W4), and upsert/delete rewrite only
        the touched buckets via ``Table.replace_partitions``.  The write is
        hash-distributed on the partition key (one shuffle) so file count is
        O(partitions), not O(tasks x partitions)."""
        buckets = self._bucket_count()
        if buckets is None:
            # adaptive layout: size to the corpus.  count() over columnar
            # sources is footer-only (column-pruned to zero columns), so this
            # does not re-read content even at 100 TB.
            n = source.count()
            buckets = max(1, min(self.BUCKET_MAX,
                                 -(-n // self.BUCKET_TARGET_DOCS)))
        cols = [F.col(c) for c in ("repo", "path", "commit", "lang", "content")]
        if fields_map_col:
            cols.append(F.col(fields_map_col).alias("fields"))
        else:
            cols.append(F.lit(None).cast("map<string,string>").alias("fields"))
        docs = (source.select(*cols)
                .withColumn("content_sha256", F.sha2(F.col("content"), 256))
                .withColumn("kb", F.pmod(F.hash("repo", "path"),
                                         F.lit(int(buckets))).cast("int")))
        snap = self.catalog.table("docs").overwrite(
            docs.repartition(F.col("repo"), F.col("kb")),
            partition_by=["repo", "kb"],
            properties={"stage": "docs", "doc_buckets": int(buckets)})
        return snap.snapshot_id

    # ------------------------------------------------------------- docs_meta
    def assign_doc_ids(self, docs: DataFrame, n_parts: int | None = None) -> DataFrame:
        """Deterministic dense docIDs ordered by (repo, path) — pure JVM.

        Scalable two-pass: range-shuffle + local sort, then
        ``monotonically_increasing_id()`` (= partitionId·2^33 + physical row
        ordinal) gives each row its partition and local ordinal *inside
        whole-stage codegen*; a tiny per-partition count collect + broadcast
        prefix-sum join turns that into a dense global ``row_number() OVER
        (ORDER BY repo, path)`` with ONE shuffle of the data and zero bytes
        through Python (document content never crosses the Arrow boundary
        here — it used to, and at high task concurrency that serialization
        alone saturated memory bandwidth).

        The sorted frame is persisted between the count pass and its
        consumers; docIDs are deterministic regardless (the within-partition
        sort fixes row order), the cache only avoids recompute.  Caller
        releases via _release_id_cache().
        """
        if n_parts is None:
            try:
                n_docs = docs.count()
            except Exception:
                n_docs = 0
            n_parts = max(int(np.ceil(max(n_docs, 1) / self.docs_per_slice)),
                          self.spark.sparkContext.defaultParallelism, 1)
        sort_cols = (self.index_sort or []) + ["repo", "path"]
        sorted_df = (docs.repartitionByRange(n_parts, *sort_cols)
                     .sortWithinPartitions(*sort_cols)
                     .withColumn("_mid", F.monotonically_increasing_id())
                     .persist())
        self._id_cache = sorted_df
        counts = (sorted_df
                  .groupBy(F.shiftrightunsigned("_mid", 33).alias("_pid"))
                  .count().collect())
        offsets = np.zeros(n_parts + 1, dtype=np.int64)
        for r in counts:
            offsets[int(r["_pid"]) + 1] = r["count"]
        offsets = np.cumsum(offsets)
        offs_df = self.spark.createDataFrame(
            [(int(p), int(offsets[p])) for p in range(n_parts)],
            "_pid long, _off long")
        out_cols = [c for c in sorted_df.columns if c != "_mid"] + ["doc_id"]
        return (sorted_df
                .withColumn("_pid", F.shiftrightunsigned("_mid", 33))
                .join(F.broadcast(offs_df), "_pid")
                .withColumn("doc_id",
                            F.col("_off") + (F.col("_mid") % F.lit(1 << 33)))
                .select(*out_cols))

    def _release_id_cache(self) -> None:
        cache = getattr(self, "_id_cache", None)
        if cache is not None:
            cache.unpersist()
            self._id_cache = None

    # ---------------------------------------------------------------- tokens
    def _field_values(self, docs_meta: DataFrame) -> DataFrame:
        """(doc_id, field, value) rows: content -> field 'text'; map fields
        exploded (reference indexMap path, LuceneIndexBean.java:308-356 —
        each map key becomes a searchable analyzed field)."""
        text = docs_meta.select("doc_id", F.lit("text").alias("field"),
                                F.col("content").alias("value"))
        mapped = (docs_meta.where(F.col("fields").isNotNull())
                  .select("doc_id", F.explode("fields").alias("field", "value")))
        return text.unionByName(mapped)

    def tokens_df(self, docs_meta: DataFrame) -> DataFrame:
        # explicit parallelism: file reads are whole-file tasks (session.py),
        # so spread the tokenize work across the cluster ourselves
        par = max(self.spark.sparkContext.defaultParallelism, 4)
        fv = self._field_values(docs_meta).repartition(par)

        variant = self.analyzer

        def tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                t = tokenize_series(pdf["value"], variant=variant)
                rows = t["row"].to_numpy()
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"].to_numpy()[rows],
                    "field": pdf["field"].to_numpy()[rows],
                    "term": t["term"],
                    "pos": t["pos"].astype(np.int32),
                })

        return fv.mapInPandas(tok, schema=TOKENS_SCHEMA)

    def doc_postings_df(self, docs_meta: DataFrame) -> DataFrame:
        """Per-doc postings (field, term, doc_id, tf, dl, positions) computed
        entirely MAP-SIDE: tf, sorted positions and the doc length are all
        local to one document, so no shuffle (and no collect_list aggregation)
        is needed to materialize the flat postings — the single shuffle in the
        flat stage is just the (field, term) clustering of the output.
        Vectorized numpy run-length grouping, no per-row Python."""
        par = max(self.spark.sparkContext.defaultParallelism, 4)
        fv = self._field_values(docs_meta).repartition(par)
        schema = ("field string, term string, doc_id long, tf int, dl long, "
                  "positions array<int>")

        variant = self.analyzer

        def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                t = tokenize_series(pdf["value"], variant=variant)
                if not len(t):
                    continue
                rows = t["row"].to_numpy()
                doc = pdf["doc_id"].to_numpy()[rows]
                fld = pdf["field"].to_numpy()[rows]
                term = t["term"].to_numpy()
                pos = t["pos"].to_numpy()
                # sort by (value-row, field, term, pos); rows within one value
                # row share doc+field, so sorting by (row, term) suffices
                order = np.lexsort((pos, term, rows))
                doc, fld, term, pos, rows = (doc[order], fld[order],
                                             term[order], pos[order], rows[order])
                # run boundaries per (row, term)
                new_run = np.ones(len(term), dtype=bool)
                new_run[1:] = (rows[1:] != rows[:-1]) | (term[1:] != term[:-1])
                starts = np.flatnonzero(new_run)
                ends = np.append(starts[1:], len(term))
                tf = (ends - starts).astype(np.int32)
                # dl per value-row (stop-filtered token count), broadcast to runs
                row_ids, row_counts = np.unique(rows, return_counts=True)
                dl = row_counts[np.searchsorted(row_ids, rows[starts])].astype(np.int64)
                positions = np.split(pos.astype(np.int32), ends[:-1])
                yield pd.DataFrame({
                    "field": fld[starts], "term": term[starts],
                    "doc_id": doc[starts], "tf": tf, "dl": dl,
                    "positions": positions,
                })

        return fv.mapInPandas(build, schema=schema)

    # ------------------------------------------------------- flat + stats
    def build(self, source: DataFrame, fields_map_col: str | None = None) -> BuildResult:
        """Run all stages.  Each stage commits its table with a fingerprint
        tied to the docs snapshot; a re-run with the same fingerprint skips
        the stage (checkpoint-resume, north rule)."""
        docs_snap = self.ingest_docs(source, fields_map_col)
        return self.build_from_docs(docs_snap)

    def _stage_done(self, table: str, fingerprint: str) -> bool:
        t = self.catalog.table(table)
        if not t.exists():
            return False
        return t.snapshot().properties.get("fingerprint") == fingerprint

    def build_from_docs(self, docs_snap: int | None = None) -> BuildResult:
        import time as _time

        from lucene_plugin_spark.index import fused

        docs_t = self.catalog.table("docs")
        if docs_snap is None:
            docs_snap = docs_t.current_snapshot_id()
        docs = docs_t.read(self.spark, docs_snap)
        fp = (f"docs-{docs_snap}" if self.analyzer == "standard"
              else f"docs-{docs_snap}-{self.analyzer}")
        if self.index_sort:
            fp += "-sort:" + ",".join(self.index_sort)
        self.stage_times = {}
        _t0 = _time.perf_counter()

        def _mark(stage: str) -> None:
            nonlocal _t0
            now = _time.perf_counter()
            self.stage_times[stage] = round(now - _t0, 3)
            _t0 = now

        # ---- docs_meta: one range shuffle, all JVM; written partitioned by
        # dslice so every slice is its own file.  While the id-staging frame
        # is cached, the fused segment pass consumes it DIRECTLY (range
        # partitions are contiguous docID ranges = whole slices), so segment
        # building never re-reads the corpus from parquet; on resume it falls
        # back to the slice-aligned docs_meta files.
        n_docs = docs.count()
        _mark("count")
        meta_df = None
        if not self._stage_done("docs_meta", fp):
            n_parts = max(int(np.ceil(max(n_docs, 1) / self.docs_per_slice)),
                          self.spark.sparkContext.defaultParallelism, 1)
            meta_df = (self.assign_doc_ids(docs, n_parts)
                       .withColumn("dslice", (F.col("doc_id")
                                              / F.lit(self.docs_per_slice)).cast("int"))
                       .withColumn("gen", F.lit(0)))
            # the persisted mapping is SKINNY (no content/fields): the corpus
            # already lives in the docs table, and at 100 TB writing it a
            # second time just to attach docIDs would double the ingest I/O.
            # Content flows to the segment pass through the id shuffle below.
            skinny = [c for c in ("repo", "path", "commit", "lang", "doc_id",
                                  "dslice", "gen") if c in meta_df.columns]
            self.catalog.table("docs_meta").overwrite(
                meta_df.select(*skinny), partition_by=["dslice"],
                properties={"stage": "docs_meta", "fingerprint": fp},
                lineage={"input": {"table": "docs", "snapshot": docs_snap}})
        docs_meta = self.catalog.table("docs_meta").read(self.spark)
        _mark("docs_meta")

        # ---- compressed doc-range segments: the fused tokenize->blocks map
        # pass (analysis + W1 inverted-index build + per-slice norms), NO
        # shuffle — task in = one doc-slice, task out = that slice's file.
        #
        # Bandwidth-aware concurrency: the fused kernel is memory-bandwidth
        # bound (Arrow string kernels), and on a single socket aggregate
        # throughput PEAKS below the core count once concurrent streams
        # saturate the memory controller (measured here: per-task tokenize
        # time is flat through 16 concurrent workers, 2.6x at 32 — so 16
        # tasks outperform 32).  LPS_FUSED_TASKS caps the stage's concurrent
        # tasks via a shuffle-free coalesce (adjacent range partitions merge,
        # slices stay whole).  On a multi-executor cluster each executor
        # brings its own socket, so the cap is per-host there.
        if not self._stage_done("segments", fp):
            if meta_df is not None:
                seg_src = meta_df
            else:
                # resume path: docs_meta is committed but skinny — rejoin the
                # corpus content by key and restore slice alignment (tasks
                # must hold whole slices, and a slice's docIDs must not
                # interleave across tasks).  Only ever paid on resume.
                seg_src = (docs.join(
                    docs_meta.select("repo", "path", "doc_id", "dslice"),
                    ["repo", "path"])
                    .repartition(F.col("dslice")))
            cols = ["dslice", "doc_id", "content"]
            if "fields" in seg_src.columns:
                cols.append("fields")
            seg_in = seg_src.select(*cols)
            import os as _os
            fused_tasks = int(_os.environ.get("LPS_FUSED_TASKS", "0"))
            if fused_tasks <= 0 and \
                    self.spark.sparkContext.master.startswith("local") and \
                    self.spark.sparkContext.defaultParallelism > 16:
                # single-socket local mode: measured knee of the memory
                # controller is ~16 concurrent Arrow-kernel streams — beyond
                # it per-task time inflates faster than parallelism grows
                fused_tasks = 16
            if fused_tasks > 0:
                seg_in = seg_in.coalesce(fused_tasks)
            seg = seg_in.mapInArrow(
                fused.make_fused_segment_kernel(self.docs_per_slice,
                                                self.block_size,
                                                self.analyzer),
                fused.SEGMENT_DDL)
            self.catalog.table("segments").overwrite(
                seg, partition_by=["dslice"],
                properties={"stage": "segments", "fingerprint": fp,
                            "analyzer": self.analyzer,
                            "index_sort": self.index_sort},
                lineage={"doc_slices": "dslice = doc_id // %d" % self.docs_per_slice,
                         "input": {"table": "docs_meta", "fingerprint": fp}})
        self._release_id_cache()
        _mark("segments")
        seg = self.catalog.table("segments").read(self.spark)
        norm_rows = seg.where(F.col("term") == fused.NORMS_TERM)

        # ---- derived tables: three independent chains over the segments
        # scan, submitted CONCURRENTLY (Spark schedules jobs from multiple
        # driver threads; the driver must not serialize commit+planning
        # latencies it doesn't have to — this is most of the small-corpus
        # build constant)
        def _norms_chain() -> None:
            # norms sidecars decoded from the per-slice norms rows (tiny
            # scans: row-group stats put term='' first in every file)
            if not self._stage_done("doc_norms", fp):
                norms = (norm_rows
                         .select("dslice", "field", "doc_gaps", "tfs")
                         .mapInArrow(fused.decode_norms_kernel, fused.NORMS_DDL))
                self.catalog.table("doc_norms").overwrite(
                    norms, partition_by=["dslice"],
                    properties={"stage": "doc_norms", "fingerprint": fp})
            if not self._stage_done("field_lens", fp):
                # field_lens is doc_norms minus the dslice column: share the
                # same data files (Iceberg analogue: a second table over the
                # same manifest) instead of rewriting them
                self.catalog.table("field_lens").commit_dirs(
                    self.catalog.table("doc_norms").snapshot().data_dirs,
                    properties={"stage": "field_lens", "fingerprint": fp})
            if not self._stage_done("stats", fp):
                lens = (self.catalog.table("field_lens").read(self.spark)
                        .select("field", "doc_id", "dl"))
                # sum_dl kept exact (integer) so mutations can delta-update
                # avgdl without rescanning lens (avgdl = sum_dl / n_docs)
                st = lens.groupBy("field").agg(
                    F.count(F.lit(1)).cast("long").alias("n_docs"),
                    F.sum("dl").cast("long").alias("sum_dl"),
                    F.avg("dl").alias("avgdl"))
                self.catalog.table("stats").overwrite(
                    st, properties={"stage": "stats", "fingerprint": fp})

        def _term_dict_stage() -> None:
            # term dictionary: columnar agg over block metadata (positions /
            # codec columns pruned); df = Σ doc_count, cf = Σ tf_sum
            if not self._stage_done("term_dict", fp):
                td = (seg.where(F.col("term") != fused.NORMS_TERM)
                      .groupBy("field", "term").agg(
                          F.sum("doc_count").cast("long").alias("df"),
                          F.sum("tf_sum").cast("long").alias("cf")))
                self.catalog.table("term_dict").overwrite(
                    td, properties={"stage": "term_dict", "fingerprint": fp})

        # NOTE: there is deliberately NO materialized flat-postings stage.
        # Segments are the single durable postings store; the declarative
        # executor and the mutation deltas DERIVE flat postings on demand via
        # flat_view() (a term/slice-filtered decode).  A persisted flat copy
        # would double-to-triple index bytes at 100 TB and go stale on every
        # mutation (round-1 VERDICT item 5).
        #
        # Concurrent chains help when stages are FIXED-COST dominated (small
        # corpora: overlap planning/commit latencies) and hurt when they are
        # throughput-dominated (large corpora: interleaved stages thrash task
        # slots and Python workers).  Cut over on corpus size;
        # LPS_BUILD_CONCURRENCY overrides.
        import os as _os
        default_workers = 2 if n_docs <= 100_000 else 1
        workers = int(_os.environ.get("LPS_BUILD_CONCURRENCY", default_workers))
        if workers > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=workers) as pool:
                futures = [pool.submit(fn) for fn in
                           (_norms_chain, _term_dict_stage)]
                for fut in futures:
                    fut.result()
        else:
            _norms_chain()
            _term_dict_stage()
        _mark("derived")

        return BuildResult(n_docs=n_docs, docs_snapshot=docs_snap,
                           segments_snapshot=self.catalog.table("segments").current_snapshot_id())

    # ------------------------------------------------------------- flat view
    def flat_view(self, terms: list[str] | None = None,
                  fields: list[str] | None = None,
                  dslices: list[int] | None = None) -> DataFrame:
        """See :func:`flat_postings_view`."""
        return flat_postings_view(self.spark, self.catalog, terms=terms,
                                  fields=fields, dslices=dslices)

    # ---------------------------------------------------------- segments
    def segment_blocks(self, flat: DataFrame, lens: DataFrame | None = None) -> DataFrame:
        """Compressed posting blocks + per-slice norms rows for the given
        (live) flat postings — a COMPLETE slice-file image, so callers
        (mutation appends, dirty-slice compaction) can swap whole dslice
        partitions and every downstream decode (flat_view dl fill, the norms
        chain) keeps working.

        Grouped by doc-slice: each applyInPandas group is one bounded doc
        range, so hot-term skew never concentrates in one task (the grouping
        key is the doc range, not the term — SURVEY.md §4 P8 salting falls
        out of the layout).
        """
        bsz = self.block_size
        dps = self.docs_per_slice
        from lucene_plugin_spark.index.fused import NORMS_TERM

        # dl travels inline on every posting row (written by doc_postings_df),
        # so no flat-postings x lens join is needed here; ``lens`` is accepted
        # for API compatibility but only used as a fallback for callers whose
        # flat frame lacks the dl column.
        if "dl" not in flat.columns:
            flat = flat.join(lens, ["field", "doc_id"], "inner")
        joined = flat.withColumn("dslice", (F.col("doc_id") / F.lit(dps)).cast("int"))

        def build_blocks(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                return pd.DataFrame(columns=[f.name for f in SEGMENT_SCHEMA.fields])
            pdf = pdf.sort_values(["field", "term", "doc_id"], kind="mergesort")
            norm_frames = []
            for fname, fg in pdf.groupby("field", sort=True):
                u = (fg[["doc_id", "dl"]].drop_duplicates("doc_id")
                     .sort_values("doc_id"))
                ids = u["doc_id"].to_numpy(np.int64)
                dls = u["dl"].to_numpy(np.int64)
                norm_frames.append({
                    "field": fname, "term": NORMS_TERM,
                    "dslice": int(pdf["dslice"].iloc[0]), "block_id": 0,
                    "doc_count": len(ids), "first_doc": int(ids[0]),
                    "last_doc": int(ids[-1]),
                    "doc_gaps": codec.encode_ids(ids),
                    "tfs": codec.varint_encode(dls.astype(np.uint64)),
                    "positions": b"", "pos_lens_ok": 0, "block_max_tf": 0,
                    "block_min_dl": 0, "tf_sum": 0,
                })
            doc_ids = pdf["doc_id"].to_numpy(np.int64)
            tfs = pdf["tf"].to_numpy(np.int64)
            dls = pdf["dl"].to_numpy(np.int64)
            # term-run boundaries
            keys = (pdf["field"] + "\x00" + pdf["term"]).to_numpy()
            new_run = np.ones(len(pdf), dtype=bool)
            new_run[1:] = keys[1:] != keys[:-1]
            run_starts = np.flatnonzero(new_run)
            run_ends = np.append(run_starts[1:], len(pdf))
            pos_lists = pdf["positions"].to_numpy()
            out = {k: [] for k in ("field", "term", "dslice", "block_id", "doc_count",
                                   "first_doc", "last_doc", "doc_gaps", "tfs",
                                   "positions", "pos_lens_ok", "block_max_tf",
                                   "block_min_dl", "tf_sum")}
            dslice = int(pdf["dslice"].iloc[0])
            for s, e in zip(run_starts, run_ends):
                field = pdf["field"].iloc[s]
                term = pdf["term"].iloc[s]
                for b0 in range(s, e, bsz):
                    b1 = min(b0 + bsz, e)
                    ids = doc_ids[b0:b1]
                    btf = tfs[b0:b1]
                    bdl = dls[b0:b1]
                    pcat = np.concatenate([np.asarray(p, dtype=np.int64)
                                           for p in pos_lists[b0:b1]])
                    out["field"].append(field)
                    out["term"].append(term)
                    out["dslice"].append(dslice)
                    out["block_id"].append((b0 - s) // bsz)
                    out["doc_count"].append(b1 - b0)
                    out["first_doc"].append(int(ids[0]))
                    out["last_doc"].append(int(ids[-1]))
                    out["doc_gaps"].append(codec.encode_ids(ids))
                    out["tfs"].append(codec.varint_encode(btf.astype(np.uint64)))
                    out["positions"].append(codec.encode_positions(pcat, btf))
                    out["pos_lens_ok"].append(1)
                    out["block_max_tf"].append(int(btf.max()))
                    out["block_min_dl"].append(int(bdl.min()))
                    out["tf_sum"].append(int(btf.sum()))
            blocks = pd.DataFrame(out)
            norms = pd.DataFrame(norm_frames)
            return pd.concat([norms, blocks], ignore_index=True)

        return joined.groupBy("dslice").applyInPandas(build_blocks, schema=SEGMENT_SCHEMA)


def flat_postings_view(spark: SparkSession, catalog: Catalog,
                       terms: list[str] | None = None,
                       fields: list[str] | None = None,
                       dslices: list[int] | None = None) -> DataFrame:
    """Flat postings (field, term, doc_id, tf, dl, positions) DERIVED from
    the segments table — the on-demand replacement for a persisted flat copy
    (segments are the single durable postings store; a materialized flat
    table would double-to-triple index bytes at 100 TB and go stale on every
    mutation).  Filters apply to the *segments* scan — ``term`` reaches
    parquet as a pushed predicate over the term-sorted row groups and
    ``dslice`` prunes partitions — BEFORE the vectorized block decode, so
    decode cost is O(matching blocks).  Norms rows (term='') travel with
    their slice so dl is filled task-locally, no shuffle anywhere."""
    from lucene_plugin_spark.index import fused
    seg = catalog.table("segments").read(spark)
    if dslices is not None:
        seg = seg.where(F.col("dslice").isin([int(d) for d in dslices]))
    cond = None
    if terms is not None:
        cond = F.col("term").isin(list(terms) + [fused.NORMS_TERM])
    if fields is not None:
        fcond = F.col("field").isin(list(fields) )
        cond = fcond if cond is None else (cond & fcond)
    if cond is not None:
        seg = seg.where(cond)
    flat = seg.mapInArrow(fused.decode_flat_kernel, fused.FLAT_DDL)
    if terms is not None:
        flat = flat.where(F.col("term").isin(list(terms)))
    return flat
