"""Incremental index mutations: upsert / delete / clear (reference W2-W4,
SURVEY.md §2.3) without full rebuild — O(touched partitions), not O(corpus).

Semantics (LuceneIndexBean.java:256,343 updateDocument; :462-540 deletes):
- upsert = last-write-wins by (repo, path): the old doc's postings are dead,
  the new content gets a NEW docID (exactly like Lucene's delete+add);
- delete by key / clear collection = tombstone the docIDs.

Mechanics, Spark-first — every step is partition-scoped:
- the ``docs`` table is hive-partitioned by (repo, key-bucket); upsert/delete
  rewrite ONLY the buckets their keys hash into (``Table.replace_partitions``
  = Iceberg overwritePartitions), and ``clear`` is a metadata-only partition
  drop.  An upsert of k docs rewrites O(k/doc_buckets · bucket size) bytes —
  at 100 TB, one upserted doc touches one bucket of one repo, never the table;
- tombstones: a doc_id table partitioned by dslice; the query kernel reads
  its slice's tombstones task-locally (like the norms sidecar) and the
  DataFrame path anti-joins — the analogue of Lucene's liveDocs bitmap;
- new docs get dense docIDs starting at the next slice boundary above
  max_doc, ordered by (repo, path): new docs only ever create FRESH
  doc-slices, so existing segment/norms files are never rewritten (pure
  append; docs_meta carries a ``gen`` column so collection filters stay
  numeric range predicates — per (repo, gen) runs);
- term_dict/stats are updated by EXACT DELTAS, never recomputed from a full
  scan: the dead docs' postings are decoded from the tombstoned slices only
  (segments partition-pruned to those dslices — flat_postings_view), the new
  batch contributes its own tiny aggregate, and both deltas merge into the
  previous term_dict/stats snapshot.  BM25 df/N/avgdl always reflect the
  live doc set — *stronger* than Lucene, which serves stale df until merge;
- ``compact()`` = the tiered merge stage (W7, the analogue of Lucene's
  TieredMergePolicy at LuceneIndexBean.java:681-686): only doc-slices whose
  tombstone fraction crosses a threshold are rewritten (dirty-slice
  partition swap); clean slices' files are untouched, their manifests
  carried forward.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lucene_plugin_spark.index.builder import IndexBuilder, flat_postings_view
from lucene_plugin_spark.storage.catalog import Catalog

TOMBSTONE_SCHEMA = "doc_id long, dslice int"


class IndexMutator:
    def __init__(self, spark: SparkSession, catalog: Catalog, builder: IndexBuilder):
        self.spark = spark
        self.catalog = catalog
        self.builder = builder

    # ------------------------------------------------------------ helpers
    def _meta(self) -> DataFrame:
        return self.catalog.table("docs_meta").read(self.spark)

    def _live_meta(self) -> DataFrame:
        """docs_meta minus already-tombstoned rows.  Victim resolution MUST
        use this: docs_meta keeps dead rows until compaction, and re-killing
        an already-dead docID would subtract its postings from term_dict and
        stats a second time (the aggregates are delta-maintained)."""
        meta = self._meta()
        tt = self.catalog.table("tombstones")
        if tt.exists():
            meta = meta.join(tt.read(self.spark).select("doc_id"),
                             "doc_id", "left_anti")
        return meta

    def _tombstone(self, doc_ids: DataFrame) -> None:
        """Append doc_ids (column 'doc_id') to the tombstones table."""
        dps = self.builder.docs_per_slice
        t = doc_ids.select(
            F.col("doc_id").cast("long"),
            (F.col("doc_id") / F.lit(dps)).cast("int").alias("dslice"))
        tt = self.catalog.table("tombstones")
        if tt.exists():
            tt.append(t, partition_by=["dslice"])
        else:
            tt.overwrite(t, partition_by=["dslice"])

    def _docs_is_bucketed(self, docs: DataFrame) -> bool:
        return "kb" in docs.columns

    def _rewrite_docs_partitions(self, delete_keys: DataFrame,
                                 updates: DataFrame | None) -> None:
        """Copy-on-write of ONLY the (repo, kb) buckets the keys hash into.

        The scan of the touched buckets is partition-pruned (the OR-of-equals
        predicate is on the two partition columns), so bytes read AND written
        are O(touched buckets), independent of table size."""
        docs_t = self.catalog.table("docs")
        docs = docs_t.read(self.spark)
        if not self._docs_is_bucketed(docs):
            # legacy unpartitioned layout: full copy-on-write (only path
            # available without a bucketed layout; new builds never take it)
            live = docs.join(delete_keys.select("repo", "path"),
                             ["repo", "path"], "left_anti")
            if updates is not None:
                live = live.unionByName(updates.drop("kb"),
                                        allowMissingColumns=True)
            docs_t.overwrite(live, properties={"stage": "docs"})
            return
        pairs = sorted({(r["repo"], int(r["kb"])) for r in
                        delete_keys.withColumn(
                            "kb", self.builder.key_bucket(F.col("repo"), F.col("path")))
                        .select("repo", "kb").distinct().collect()})
        cond = None
        for repo, kb in pairs:
            c = (F.col("repo") == repo) & (F.col("kb") == kb)
            cond = c if cond is None else (cond | c)
        touched = docs.where(cond)
        live = touched.join(delete_keys.select("repo", "path"),
                            ["repo", "path"], "left_anti")
        if updates is not None:
            live = live.unionByName(updates.select(*touched.columns))
        docs_t.replace_partitions(
            live, ["repo", "kb"], pairs,
            properties={"stage": "docs",
                        "doc_buckets": self.builder._bucket_count() or 8},
            lineage={"replaced_buckets": [list(p) for p in pairs]})

    def _apply_aggregate_deltas(self, dead: DataFrame | None,
                                flat_new: DataFrame | None,
                                lens_new: DataFrame | None) -> None:
        """Exact delta update of term_dict + stats.

        ``dead``: (doc_id, dslice) of newly-tombstoned docs — their postings
        are decoded from the affected dslices ONLY (partition-pruned segments
        scan); ``flat_new``/``lens_new``: the new batch's postings/lengths.
        Both deltas are O(batch + touched slices); the merge joins are over
        the (small relative to postings) term_dict / per-field stats tables.
        """
        deltas = []
        stat_deltas = []
        if dead is not None:
            dslices = [int(r["dslice"]) for r in
                       dead.select("dslice").distinct().collect()]
            dead_ids = dead.select("doc_id")
            dead_flat = (flat_postings_view(self.spark, self.catalog,
                                            dslices=dslices)
                         .join(F.broadcast(dead_ids), "doc_id", "left_semi"))
            deltas.append(dead_flat.groupBy("field", "term").agg(
                (-F.count(F.lit(1))).cast("long").alias("d_df"),
                (-F.sum("tf")).cast("long").alias("d_cf")))
            dead_lens = (self.catalog.table("doc_norms").read(self.spark)
                         .where(F.col("dslice").isin(dslices))
                         .join(F.broadcast(dead_ids), "doc_id", "left_semi"))
            stat_deltas.append(dead_lens.groupBy("field").agg(
                (-F.count(F.lit(1))).cast("long").alias("d_n"),
                (-F.sum("dl")).cast("long").alias("d_sum")))
        if flat_new is not None:
            deltas.append(flat_new.groupBy("field", "term").agg(
                F.count(F.lit(1)).cast("long").alias("d_df"),
                F.sum("tf").cast("long").alias("d_cf")))
        if lens_new is not None:
            stat_deltas.append(lens_new.groupBy("field").agg(
                F.count(F.lit(1)).cast("long").alias("d_n"),
                F.sum("dl").cast("long").alias("d_sum")))
        if deltas:
            delta = deltas[0]
            for d in deltas[1:]:
                delta = delta.unionByName(d)
            delta = delta.groupBy("field", "term").agg(
                F.sum("d_df").alias("d_df"), F.sum("d_cf").alias("d_cf"))
            old = self.catalog.table("term_dict").read(self.spark)
            new = (old.join(delta, ["field", "term"], "full_outer")
                   .select("field", "term",
                           (F.coalesce(F.col("df"), F.lit(0))
                            + F.coalesce(F.col("d_df"), F.lit(0))).cast("long").alias("df"),
                           (F.coalesce(F.col("cf"), F.lit(0))
                            + F.coalesce(F.col("d_cf"), F.lit(0))).cast("long").alias("cf"))
                   .where(F.col("df") > 0))
            self.catalog.table("term_dict").overwrite(
                new, properties={"stage": "term_dict", "delta_update": True})
        if stat_deltas:
            sdelta = stat_deltas[0]
            for d in stat_deltas[1:]:
                sdelta = sdelta.unionByName(d)
            sdelta = sdelta.groupBy("field").agg(
                F.sum("d_n").alias("d_n"), F.sum("d_sum").alias("d_sum"))
            st_t = self.catalog.table("stats")
            old = st_t.read(self.spark)
            if "sum_dl" not in old.columns:
                # legacy stats (no exact sum): one-time rebuild from lens
                lens = self.catalog.table("field_lens").read(self.spark)
                old = lens.groupBy("field").agg(
                    F.count(F.lit(1)).cast("long").alias("n_docs"),
                    F.sum("dl").cast("long").alias("sum_dl"),
                    F.avg("dl").alias("avgdl"))
            new = (old.join(sdelta, "field", "full_outer")
                   .select("field",
                           (F.coalesce(F.col("n_docs"), F.lit(0))
                            + F.coalesce(F.col("d_n"), F.lit(0))).cast("long").alias("n_docs"),
                           (F.coalesce(F.col("sum_dl"), F.lit(0))
                            + F.coalesce(F.col("d_sum"), F.lit(0))).cast("long").alias("sum_dl"))
                   .where(F.col("n_docs") > 0)
                   .withColumn("avgdl", F.col("sum_dl").cast("double")
                               / F.col("n_docs").cast("double")))
            st_t.overwrite(new.select("field", "n_docs", "sum_dl", "avgdl"),
                           properties={"stage": "stats", "delta_update": True})

    # ------------------------------------------------------------ mutations
    def upsert(self, updates: DataFrame, fields_map_col: str | None = None) -> int:
        """Last-write-wins upsert of (repo, path, commit, lang, content
        [, fields]) rows.  Returns the number of upserted docs."""
        cols = [F.col(c) for c in ("repo", "path", "commit", "lang", "content")]
        if fields_map_col:
            cols.append(F.col(fields_map_col).alias("fields"))
        else:
            cols.append(F.lit(None).cast("map<string,string>").alias("fields"))
        updates = (updates.select(*cols)
                   .withColumn("content_sha256", F.sha2(F.col("content"), 256))
                   .withColumn("kb", self.builder.key_bucket(F.col("repo"),
                                                             F.col("path"))))
        n_new = updates.count()
        if n_new == 0:
            return 0
        meta = self._meta()
        keys = updates.select("repo", "path")
        old = (self._live_meta().join(keys, ["repo", "path"], "left_semi")
               .select("doc_id", "dslice").persist())
        n_dead = old.count()
        if n_dead:
            self._tombstone(old.select("doc_id"))

        # docs table: partition-scoped copy-on-write of affected buckets only
        self._rewrite_docs_partitions(keys, updates)

        # new docIDs start at the NEXT slice boundary above max_doc: new docs
        # only ever create fresh doc-slices, so the segment append below never
        # rewrites an existing slice file (one-live-file-per-slice invariant
        # kept append-only; the docID gap this leaves is harmless)
        max_doc = meta.agg(F.max("doc_id")).collect()[0][0]
        dps = self.builder.docs_per_slice
        base = ((int(max_doc) // dps) + 1) * dps if max_doc is not None else 0
        gen = int(meta.agg(F.max(F.coalesce(F.col("gen"), F.lit(0)))).collect()[0][0]) + 1 \
            if "gen" in meta.columns else 1
        new_meta = self.builder.assign_doc_ids(updates)
        new_meta = (new_meta.withColumn("doc_id", F.col("doc_id") + F.lit(base))
                    .withColumn("gen", F.lit(gen))
                    .withColumn("dslice", (F.col("doc_id") / F.lit(dps)).cast("int")))
        meta_cols = [c for c in ("repo", "path", "commit", "lang", "doc_id",
                                 "dslice", "gen") if c in new_meta.columns]
        self.catalog.table("docs_meta").append(
            new_meta.select(*meta_cols), partition_by=["dslice"],
            properties={"stage": "docs_meta"})
        self.builder._release_id_cache()

        # incremental postings/norms/segments for the NEW docs only
        flat_new = self.builder.doc_postings_df(new_meta).persist()
        lens_new = (flat_new.select("field", "doc_id", "dl").distinct()
                    .select("field", "doc_id", F.col("dl").cast("long").alias("dl")))
        norms_new = lens_new.withColumn(
            "dslice", (F.col("doc_id") / F.lit(dps)).cast("int"))
        self.catalog.table("doc_norms").append(
            norms_new.repartition(F.col("dslice")).sortWithinPartitions("field", "doc_id"),
            partition_by=["dslice"])
        # field_lens shares doc_norms' data files (same schema minus layout)
        self.catalog.table("field_lens").commit_dirs(
            self.catalog.table("doc_norms").snapshot().data_dirs,
            properties={"stage": "field_lens"})
        self._append_segments(flat_new, base)
        self._apply_aggregate_deltas(old if n_dead else None, flat_new, lens_new)
        flat_new.unpersist()
        old.unpersist()
        return n_new

    def _append_segments(self, flat_new: DataFrame, base: int) -> None:
        """Append compressed blocks (+ norms rows) for the new docs — pure
        append: new docs live in fresh doc-slices (base is slice-aligned), so
        existing slice files are untouched and the snapshot just gains new
        dslice dirs."""
        new_blocks = self.builder.segment_blocks(flat_new)
        self.catalog.table("segments").append(
            new_blocks.repartition(F.col("dslice"))
            .sortWithinPartitions("field", "term", "first_doc"),
            partition_by=["dslice"],
            properties={"stage": "segments", "incremental_from": base},
            lineage={"appended_from_doc": base})

    def delete_keys(self, keys: DataFrame) -> int:
        """Delete by (repo, path) keys.  Returns count tombstoned."""
        keys = keys.select("repo", "path")
        victims = (self._live_meta().join(keys, ["repo", "path"], "left_semi")
                   .select("doc_id", "dslice").persist())
        n = victims.count()
        if n == 0:
            victims.unpersist()
            return 0
        self._tombstone(victims.select("doc_id"))
        self._rewrite_docs_partitions(keys, None)
        self._apply_aggregate_deltas(victims, None, None)
        victims.unpersist()
        return n

    def delete(self, repo: str, path: str) -> bool:
        keys = self.spark.createDataFrame([(repo, path)], "repo string, path string")
        return self.delete_keys(keys) > 0

    def clear(self, repo: str) -> int:
        """Delete every doc in a collection (reference W4 'clear') — on the
        bucketed layout this is a METADATA-ONLY partition drop of the repo's
        (repo, kb) partitions: no data files are read or written."""
        victims = (self._live_meta().where(F.col("repo") == repo)
                   .select("doc_id", "dslice").persist())
        n = victims.count()
        if n == 0:
            victims.unpersist()
            return 0
        self._tombstone(victims.select("doc_id"))
        docs_t = self.catalog.table("docs")
        docs = docs_t.read(self.spark)
        if self._docs_is_bucketed(docs):
            dropped = [v for v in docs_t.partition_values(["repo", "kb"])
                       if v[0] == repo]
            docs_t.drop_partitions(["repo", "kb"], dropped,
                                   properties={"stage": "docs"},
                                   lineage={"cleared_repo": repo})
        else:
            docs_t.overwrite(docs.where(F.col("repo") != repo),
                             properties={"stage": "docs"})
        self._apply_aggregate_deltas(victims, None, None)
        victims.unpersist()
        return n

    # ------------------------------------------------------------ compaction
    def compact(self, min_dead_fraction: float = 0.0) -> list[int]:
        """Tiered merge stage (W7): rewrite ONLY doc-slices whose tombstone
        fraction is >= ``min_dead_fraction`` (0.0 = every slice with any
        tombstone), dropping their dead docs; clean slices' files are carried
        forward untouched in the new snapshot.  Returns compacted dslices.

        Reference analogue: TieredMergePolicy(10,10) +
        ConcurrentMergeScheduler (LuceneIndexBean.java:671-686) — merge work
        is proportional to dirty segments, never the whole index.
        """
        tt = self.catalog.table("tombstones")
        if not tt.exists():
            return []
        tomb = tt.read(self.spark)
        dead_per_slice = tomb.groupBy("dslice").agg(
            F.count(F.lit(1)).alias("n_dead"))
        size_per_slice = (self._meta().groupBy("dslice")
                          .agg(F.count(F.lit(1)).alias("n_docs")))
        dirty_rows = (dead_per_slice.join(size_per_slice, "dslice")
                      .where(F.col("n_dead") >= F.col("n_docs")
                             * F.lit(float(min_dead_fraction)))
                      .select("dslice").collect())
        dirty = sorted(int(r["dslice"]) for r in dirty_rows)
        if not dirty:
            return []
        dead_ids = tomb.where(F.col("dslice").isin(dirty)).select("doc_id")

        # segments: decode ONLY the dirty slices, drop dead docs, re-block,
        # swap those partitions (clean slices never touched)
        live_flat = (flat_postings_view(self.spark, self.catalog, dslices=dirty)
                     .join(F.broadcast(dead_ids), "doc_id", "left_anti"))
        new_blocks = (self.builder.segment_blocks(live_flat)
                      .repartition(F.col("dslice"))
                      .sortWithinPartitions("field", "term", "first_doc"))
        self.catalog.table("segments").replace_partitions(
            new_blocks, ["dslice"], [(d,) for d in dirty],
            properties={"stage": "segments", "compacted_slices": dirty},
            lineage={"compacted": dirty})

        # norms sidecar: same partition swap
        norms_t = self.catalog.table("doc_norms")
        live_norms = (norms_t.read(self.spark)
                      .where(F.col("dslice").isin(dirty))
                      .join(F.broadcast(dead_ids), "doc_id", "left_anti"))
        norms_t.replace_partitions(
            live_norms.repartition(F.col("dslice"))
            .sortWithinPartitions("field", "doc_id"),
            ["dslice"], [(d,) for d in dirty],
            properties={"stage": "doc_norms", "compacted_slices": dirty})
        self.catalog.table("field_lens").commit_dirs(
            norms_t.snapshot().data_dirs, properties={"stage": "field_lens"})

        # docs_meta: drop dead rows of dirty slices only
        meta_t = self.catalog.table("docs_meta")
        live_meta = (self._meta().where(F.col("dslice").isin(dirty))
                     .join(F.broadcast(dead_ids), "doc_id", "left_anti"))
        meta_t.replace_partitions(
            live_meta, ["dslice"], [(d,) for d in dirty],
            properties={"stage": "docs_meta", "compacted_slices": dirty})

        # tombstones of the compacted slices are reclaimed (metadata-only)
        tt.drop_partitions(["dslice"], [(d,) for d in dirty],
                           properties={"compacted_slices": dirty})
        return dirty
