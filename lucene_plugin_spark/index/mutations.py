"""Incremental index mutations: upsert / delete / clear (reference W2-W4,
SURVEY.md §2.3) without full rebuild.

Semantics (LuceneIndexBean.java:256,343 updateDocument; :462-540 deletes):
- upsert = last-write-wins by (repo, path): the old doc's postings are dead,
  the new content gets a NEW docID (exactly like Lucene's delete+add);
- delete by key / clear collection = tombstone the docIDs.

Mechanics, Spark-first:
- tombstones: a doc_id table partitioned by dslice; the query kernel reads
  its slice's tombstones task-locally (like the norms sidecar) and the
  DataFrame path anti-joins — the analogue of Lucene's liveDocs bitmap;
- new docs get dense docIDs starting at max_doc+1, ordered by (repo, path):
  each append generation is contiguous per repo, so collection filters stay
  numeric range predicates (docs_meta carries a ``gen`` column; ranges are
  per (repo, gen) runs);
- postings/segments/norms for NEW docs are built incrementally — new docs
  land in fresh doc-slices above max_doc, so segment files of existing
  slices are untouched (the one-live-file-per-dslice invariant holds);
- term_dict/stats are small aggregates and are recomputed exactly from live
  postings (anti tombstones), so BM25 df/N/avgdl always reflect the live doc
  set — *stronger* than Lucene, which serves stale df until segment merge.
  (At 100 TB these become delta updates: subtract tombstoned docs' partition-
  pruned postings, add the new batch's; both deltas are tiny scans.)
- ``compact()`` = the merge stage (W7): rewrites postings/segments/norms
  dropping tombstoned docs, doc_ids unchanged, tombstones emptied.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lucene_plugin_spark.index.builder import IndexBuilder
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

    def _refresh_small_aggregates(self) -> None:
        """Recompute term_dict + stats from live postings (exact df/N/avgdl)."""
        flat = self.catalog.table("postings_flat").read(self.spark)
        lens = self.catalog.table("field_lens").read(self.spark)
        tt = self.catalog.table("tombstones")
        if tt.exists():
            dead = tt.read(self.spark).select("doc_id")
            flat = flat.join(dead, "doc_id", "left_anti")
            lens = lens.join(dead, "doc_id", "left_anti")
        td = flat.groupBy("field", "term").agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"))
        self.catalog.table("term_dict").overwrite(td, properties={"stage": "term_dict"})
        st = lens.groupBy("field").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.avg("dl").alias("avgdl"))
        self.catalog.table("stats").overwrite(st, properties={"stage": "stats"})

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
                   .withColumn("content_sha256", F.sha2(F.col("content"), 256)))
        n_new = updates.count()
        if n_new == 0:
            return 0
        meta = self._meta()
        keys = updates.select("repo", "path")
        old_ids = meta.join(keys, ["repo", "path"], "left_semi").select("doc_id")
        self._tombstone(old_ids)

        # docs table: copy-on-write replace of affected keys
        docs_t = self.catalog.table("docs")
        docs = docs_t.read(self.spark)
        live_docs = docs.join(keys, ["repo", "path"], "left_anti").unionByName(updates)
        docs_t.overwrite(live_docs, properties={"stage": "docs"})

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
        meta_row = new_meta.select(*meta_cols)  # skinny (table schema)
        meta_t = self.catalog.table("docs_meta")
        if "gen" not in meta.columns:
            meta_with_gen = meta.withColumn("gen", F.lit(0))
            if "dslice" not in meta.columns:
                meta_with_gen = meta_with_gen.withColumn(
                    "dslice", (F.col("doc_id") / F.lit(dps)).cast("int"))
            keep = [c for c in meta_with_gen.columns if c in set(meta_cols)]
            meta_t.overwrite(meta_with_gen.select(*keep).unionByName(meta_row),
                             properties={"stage": "docs_meta"})
        else:
            meta_t.append(meta_row, properties={"stage": "docs_meta"})
        self.builder._release_id_cache()

        # incremental postings/lens/norms/segments for the NEW docs only
        flat_new = self.builder.doc_postings_df(new_meta)
        self.catalog.table("postings_flat").append(
            flat_new.repartition(F.col("field"), F.col("term"))
            .sortWithinPartitions("field", "term", "doc_id"))
        lens_new = (flat_new.select("field", "doc_id", "dl").distinct()
                    .select("field", "doc_id", F.col("dl").cast("long").alias("dl")))
        self.catalog.table("field_lens").append(lens_new)
        dps = self.builder.docs_per_slice
        norms_new = lens_new.withColumn(
            "dslice", (F.col("doc_id") / F.lit(dps)).cast("int"))
        self.catalog.table("doc_norms").append(
            norms_new.repartition(F.col("dslice")).sortWithinPartitions("field", "doc_id"),
            partition_by=["dslice"])
        self._refresh_small_aggregates()
        self._append_segments(flat_new, lens_new, base)
        return n_new

    def _append_segments(self, flat_new: DataFrame, lens_new: DataFrame,
                         base: int) -> None:
        """Append compressed blocks for the new docs — pure append: new docs
        live in fresh doc-slices (base is slice-aligned), so existing slice
        files are untouched and the snapshot just gains new dslice dirs."""
        new_blocks = self.builder.segment_blocks(flat_new, lens_new)
        self.catalog.table("segments").append(
            new_blocks.repartition(F.col("dslice"))
            .sortWithinPartitions("field", "term", "first_doc"),
            partition_by=["dslice"],
            properties={"stage": "segments", "incremental_from": base},
            lineage={"appended_from_doc": base})

    def delete_keys(self, keys: DataFrame) -> int:
        """Delete by (repo, path) keys.  Returns count tombstoned."""
        meta = self._meta()
        victims = meta.join(keys.select("repo", "path"), ["repo", "path"], "left_semi")
        n = victims.count()
        if n == 0:
            return 0
        self._tombstone(victims.select("doc_id"))
        docs_t = self.catalog.table("docs")
        docs = docs_t.read(self.spark)
        docs_t.overwrite(docs.join(keys.select("repo", "path"), ["repo", "path"], "left_anti"),
                         properties={"stage": "docs"})
        self._refresh_small_aggregates()
        return n

    def delete(self, repo: str, path: str) -> bool:
        keys = self.spark.createDataFrame([(repo, path)], "repo string, path string")
        return self.delete_keys(keys) > 0

    def clear(self, repo: str) -> int:
        """Delete every doc in a collection (reference W4 'clear') — the
        Iceberg analogue is a partition-level DELETE."""
        meta = self._meta()
        victims = meta.where(F.col("repo") == repo)
        n = victims.count()
        if n == 0:
            return 0
        self._tombstone(victims.select("doc_id"))
        docs_t = self.catalog.table("docs")
        docs = docs_t.read(self.spark)
        docs_t.overwrite(docs.where(F.col("repo") != repo),
                         properties={"stage": "docs"})
        self._refresh_small_aggregates()
        return n

    # ------------------------------------------------------------ compaction
    def compact(self) -> None:
        """Segment-merge stage (W7): drop tombstoned docs from postings,
        norms, segments and docs_meta; doc_ids unchanged; tombstones reset."""
        tt = self.catalog.table("tombstones")
        if not tt.exists():
            return
        dead = tt.read(self.spark).select("doc_id")
        if dead.isEmpty():
            return
        flat = (self.catalog.table("postings_flat").read(self.spark)
                .join(dead, "doc_id", "left_anti"))
        self.catalog.table("postings_flat").overwrite(
            flat.repartition(F.col("field"), F.col("term")),
            properties={"stage": "postings_flat", "compacted": True})
        flat = self.catalog.table("postings_flat").read(self.spark)
        lens = (self.catalog.table("field_lens").read(self.spark)
                .join(dead, "doc_id", "left_anti"))
        self.catalog.table("field_lens").overwrite(lens, properties={"stage": "field_lens"})
        lens = self.catalog.table("field_lens").read(self.spark)
        dps = self.builder.docs_per_slice
        norms = lens.withColumn("dslice", (F.col("doc_id") / F.lit(dps)).cast("int"))
        self.catalog.table("doc_norms").overwrite(
            norms.repartition(F.col("dslice")).sortWithinPartitions("field", "doc_id"),
            partition_by=["dslice"], properties={"stage": "doc_norms"})
        meta = (self.catalog.table("docs_meta").read(self.spark)
                .join(dead, "doc_id", "left_anti"))
        self.catalog.table("docs_meta").overwrite(meta, properties={"stage": "docs_meta"})
        blocks = self.builder.segment_blocks(flat, lens)
        self.catalog.table("segments").overwrite(
            blocks.repartition(F.col("dslice")).sortWithinPartitions("field", "term", "first_doc"),
            partition_by=["dslice"], properties={"stage": "segments", "compacted": True})
        # all tombstones reclaimed (an empty parquet write is unreadable, so
        # the table is dropped; exists() gates every tombstone read)
        self.catalog.drop("tombstones")
        self._refresh_small_aggregates()
