"""Snapshot-committed parquet tables — the Iceberg analogue for this engine.

The north rule asks for Iceberg tables with snapshot commits, snapshot-pinned
reads, per-partition lineage and checkpoint-resumable stages.  This sandbox
has no Iceberg runtime jars, so this module implements the same *semantics*
over plain parquet, shaped so every call site maps 1:1 to an Iceberg catalog
on a real cluster:

- ``Table.append(df)``        -> ``df.writeTo(t).append()``
- ``Table.overwrite(df)``     -> ``df.writeTo(t).overwritePartitions()`` / replace
- ``Table.commit(...)``       -> Iceberg snapshot commit (atomic pointer swap)
- ``Table.read(snapshot_id)`` -> ``spark.read.option("snapshot-id", ...)``
- ``Table.current_snapshot()``-> snapshot pinning (reference analogue: the NRT
  searcher version, LuceneIndexBean.java:620-637 / SearcherManager)

Layout on disk::

    <root>/<table>/
        data/snap-<n>/part-*.parquet     # files written for snapshot n
        meta/manifest-<n>.json           # file list + lineage + properties
        meta/CURRENT                     # atomic pointer: current snapshot n

A manifest lists *all* live data dirs for its snapshot (append = parent dirs +
new dir; overwrite = new dir only), plus free-form ``lineage`` (used by the
index builder to record which input partitions produced which segment files —
north-rule per-partition lineage) and ``properties`` (stage markers for
checkpoint-resume).  The CURRENT pointer is swapped with ``os.replace`` —
atomic on POSIX — so readers never observe a partial commit (the analogue of
Iceberg optimistic commit; reference analogue: ``IndexWriter.commit()`` at
LuceneIndexBean.java:490-509).

Partition-level commits (the Iceberg ``overwritePartitions`` analogue):
``replace_partitions`` / ``drop_partitions`` commit a snapshot whose data-dir
list keeps the untouched hive partition directories of the parent and swaps
only the named partitions — so a mutation of k partitions rewrites O(k)
bytes, never O(table).  Such entries are stored as ``{"path": <partition
dir>, "base": <parquet root>}`` (``base`` preserves partition-column
recovery via Spark's ``basePath`` option); plain-string entries remain whole
parquet roots.  Partition values must hive-encode to themselves (ints and
sanitized collection names do; arbitrary strings would need Iceberg's
escaping).
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotError(RuntimeError):
    pass


_TAG_NAME_RE = re.compile(r"^[A-Za-z0-9._-]+$")


def _check_tag_name(name: str) -> None:
    """Tag names become filesystem paths (tags/<name>.json); reject anything
    that could escape the tags directory ('/', '..', empty, control chars)."""
    if not _TAG_NAME_RE.fullmatch(name or "") or ".." in name:
        raise ValueError(f"invalid tag name {name!r}: must match "
                         "[A-Za-z0-9._-]+ without '..'")


def entry_path(e) -> str:
    """Data-dir entry -> readable path (str entries are whole parquet roots;
    dict entries are single hive partition dirs)."""
    return e if isinstance(e, str) else e["path"]


def entry_base(e) -> str:
    """Data-dir entry -> Spark ``basePath`` (partition-column recovery)."""
    return e if isinstance(e, str) else e.get("base", e["path"])


def partition_data_dirs(data_dirs: list, col: str, value) -> list[str]:
    """Directories holding files of hive partition ``col=value`` across a
    snapshot's data-dir entries (used by task-local sidecar readers: norms,
    tombstones — the analogue of Lucene reading one segment's sidecar file)."""
    tag = f"{col}={value}"
    out = []
    for e in data_dirs:
        p = entry_path(e)
        if tag in p.split(os.sep):
            out.append(p)
        else:
            sub = os.path.join(p, tag)
            if os.path.isdir(sub):
                out.append(sub)
    return out


@dataclass
class Snapshot:
    snapshot_id: int
    data_dirs: list[str]
    lineage: dict[str, Any] = field(default_factory=dict)
    properties: dict[str, Any] = field(default_factory=dict)
    parent_id: int | None = None
    timestamp_ms: int = 0


class Table:
    """One snapshot-versioned parquet table."""

    def __init__(self, root: str, name: str):
        self.root = os.path.join(root, name)
        self.name = name
        self._meta = os.path.join(self.root, "meta")
        self._data = os.path.join(self.root, "data")
        os.makedirs(self._meta, exist_ok=True)
        os.makedirs(self._data, exist_ok=True)

    # ---- snapshot bookkeeping -------------------------------------------
    def current_snapshot_id(self) -> int | None:
        cur = os.path.join(self._meta, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return int(f.read().strip())

    def snapshot(self, snapshot_id: int | None = None) -> Snapshot:
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        if sid is None:
            raise SnapshotError(f"table {self.name} has no snapshots")
        with open(os.path.join(self._meta, f"manifest-{sid}.json")) as f:
            m = json.load(f)
        return Snapshot(
            snapshot_id=m["snapshot_id"],
            data_dirs=m["data_dirs"],
            lineage=m.get("lineage", {}),
            properties=m.get("properties", {}),
            parent_id=m.get("parent_id"),
            timestamp_ms=m.get("timestamp_ms", 0),
        )

    def exists(self) -> bool:
        return self.current_snapshot_id() is not None

    def history(self) -> list[int]:
        ids = []
        for f in os.listdir(self._meta):
            if f.startswith("manifest-") and f.endswith(".json"):
                ids.append(int(f[len("manifest-"):-len(".json")]))
        return sorted(ids)

    # ---- writes ----------------------------------------------------------
    def _next_id(self) -> int:
        cur = self.current_snapshot_id()
        return 1 if cur is None else cur + 1

    def _write_data(self, df: DataFrame, sid: int, partition_by: list[str] | None) -> str:
        d = os.path.join(self._data, f"snap-{sid}-{uuid.uuid4().hex[:8]}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(d)
        self._last_schema = df.schema.json()  # recorded in the manifest so an
        # empty snapshot (no parquet files) can still be read back typed
        return d

    def _commit(self, sid: int, data_dirs: list[str], lineage: dict, properties: dict) -> Snapshot:
        parent = self.current_snapshot_id()
        manifest = {
            "snapshot_id": sid,
            "parent_id": parent,
            "data_dirs": data_dirs,
            "lineage": lineage,
            "properties": properties,
            "schema_json": getattr(self, "_last_schema", None),
            "timestamp_ms": int(time.time() * 1000),
        }
        mpath = os.path.join(self._meta, f"manifest-{sid}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mpath)
        cur_tmp = os.path.join(self._meta, "CURRENT.tmp")
        with open(cur_tmp, "w") as f:
            f.write(str(sid))
        os.replace(cur_tmp, os.path.join(self._meta, "CURRENT"))  # atomic pointer swap
        return self.snapshot(sid)

    def append(self, df: DataFrame, partition_by: list[str] | None = None,
               lineage: dict | None = None, properties: dict | None = None) -> Snapshot:
        sid = self._next_id()
        d = self._write_data(df, sid, partition_by)
        parent_dirs = [] if self.current_snapshot_id() is None else self.snapshot().data_dirs
        return self._commit(sid, parent_dirs + [d], lineage or {}, properties or {})

    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None,
                  lineage: dict | None = None, properties: dict | None = None) -> Snapshot:
        sid = self._next_id()
        d = self._write_data(df, sid, partition_by)
        return self._commit(sid, [d], lineage or {}, properties or {})

    def commit_dirs(self, data_dirs: list[str], lineage: dict | None = None,
                    properties: dict | None = None) -> Snapshot:
        """Commit pre-written data dirs (used by multi-stage builds where each
        stage writes its own files; the commit only swaps the pointer)."""
        return self._commit(self._next_id(), data_dirs, lineage or {}, properties or {})

    # ---- partition-level commits (Iceberg overwritePartitions analogue) ----
    def _partition_leaves(self, entry, partition_by: list[str]):
        """Yield (path, base, values) leaf partition dirs of one data-dir
        entry, where ``values`` is the tuple of hive partition values."""
        p, base = entry_path(entry), entry_base(entry)
        rel = os.path.relpath(p, base)
        bound = [] if rel == "." else [seg.split("=", 1) for seg in rel.split(os.sep)]
        roots = [(p, tuple(v for _, v in bound))]
        for level in range(len(bound), len(partition_by)):
            col = partition_by[level]
            nxt = []
            for d, vals in roots:
                if not os.path.isdir(d):
                    continue
                for name in sorted(os.listdir(d)):
                    if name.startswith(f"{col}="):
                        nxt.append((os.path.join(d, name),
                                    vals + (name.split("=", 1)[1],)))
            roots = nxt
        yield from roots

    def partition_values(self, partition_by: list[str]) -> set[tuple[str, ...]]:
        """All live partition-value tuples of the current snapshot."""
        if self.current_snapshot_id() is None:
            return set()
        out: set[tuple[str, ...]] = set()
        for e in self.snapshot().data_dirs:
            for _, vals in self._partition_leaves(e, partition_by):
                out.add(vals)
        return out

    def _kept_entries(self, partition_by: list[str], replaced: set) -> list:
        kept = []
        for e in self.snapshot().data_dirs:
            base = entry_base(e)
            for d, vals in self._partition_leaves(e, partition_by):
                if vals not in replaced:
                    kept.append({"path": d, "base": base})
        return kept

    def replace_partitions(self, df: DataFrame, partition_by: list[str],
                           replaced_values, lineage: dict | None = None,
                           properties: dict | None = None) -> Snapshot:
        """Overwrite ONLY the named partitions: commit the parent's untouched
        partition dirs plus newly-written files for ``df`` (which must contain
        only rows of the replaced partitions).  O(touched partitions) bytes —
        the scale contract for mutations."""
        replaced = {tuple(str(v) for v in vals) for vals in replaced_values}
        sid = self._next_id()
        d = self._write_data(df, sid, partition_by)
        kept = self._kept_entries(partition_by, replaced) \
            if self.current_snapshot_id() is not None else []
        return self._commit(sid, kept + [d], lineage or {}, properties or {})

    def drop_partitions(self, partition_by: list[str], dropped_values,
                        lineage: dict | None = None,
                        properties: dict | None = None) -> Snapshot:
        """Metadata-only delete of whole partitions (Iceberg partition-level
        DELETE): no data files written or read, just a manifest without them."""
        dropped = {tuple(str(v) for v in vals) for vals in dropped_values}
        parent = self.snapshot()
        with open(os.path.join(self._meta, f"manifest-{parent.snapshot_id}.json")) as f:
            self._last_schema = json.load(f).get("schema_json")
        kept = self._kept_entries(partition_by, dropped)
        return self._commit(self._next_id(), kept, lineage or {}, properties or {})

    # ---- reads -----------------------------------------------------------
    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        snap = self.snapshot(snapshot_id)
        # zero data dirs (e.g. every partition dropped) falls through to the
        # schema-typed empty frame below
        # each data dir is its own parquet root (possibly hive-partitioned);
        # read each with its own basePath and union — a multi-root read would
        # trip Spark's conflicting-directory-structure check
        out = None
        from pyspark.sql.utils import AnalysisException
        # group partition-dir entries by their base so one read covers all of
        # a root's surviving partitions (keeps scan/plan size O(roots))
        by_base: dict[str, list[str]] = {}
        for e in snap.data_dirs:
            by_base.setdefault(entry_base(e), []).append(entry_path(e))
        for base, paths in by_base.items():
            try:
                df = spark.read.option("basePath", base).parquet(*paths)
            except AnalysisException:
                continue  # empty snapshot dir (zero-row write)
            out = df if out is None else out.unionByName(df, allowMissingColumns=True)
        if out is None:
            # reconstruct an empty, correctly-typed frame from the manifest
            with open(os.path.join(self._meta, f"manifest-{snap.snapshot_id}.json")) as f:
                schema_json = json.load(f).get("schema_json")
            if schema_json is None:
                raise SnapshotError(
                    f"snapshot {snap.snapshot_id} of {self.name} is empty and untyped")
            from pyspark.sql.types import StructType as _St
            return spark.createDataFrame([], _St.fromJson(json.loads(schema_json)))
        return out


class Catalog:
    """A directory of snapshot tables (≈ an Iceberg namespace)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str) -> Table:
        return Table(self.root, name)

    def drop(self, name: str) -> None:
        import shutil
        p = os.path.join(self.root, name)
        if os.path.exists(p):
            shutil.rmtree(p)

    # ---- index-level snapshot tags (Iceberg table-tag analogue) ----------
    def table_names(self) -> list[str]:
        """Names of tables that have at least one committed snapshot."""
        out = []
        for d in sorted(os.listdir(self.root)):
            if d == "tags":
                continue
            if os.path.exists(os.path.join(self.root, d, "meta", "CURRENT")):
                out.append(d)
        return out

    def tag(self, name: str, pins: dict[str, int] | None = None) -> dict[str, int]:
        """Record a named cross-table snapshot: {table -> snapshot_id} for
        every committed table (or the explicit ``pins``).  Tables created
        AFTER the tag (e.g. tombstones) are simply absent — a tag-pinned
        reader treats absence as "did not exist yet".  This is the engine's
        time-travel anchor (Iceberg tags pin one table; an index is several
        tables that must travel together)."""
        _check_tag_name(name)
        if pins is None:
            pins = {t: self.table(t).current_snapshot_id()
                    for t in self.table_names()}
        tags_dir = os.path.join(self.root, "tags")
        os.makedirs(tags_dir, exist_ok=True)
        path = os.path.join(tags_dir, f"{name}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(pins, f, indent=1)
        os.replace(tmp, path)
        return pins

    def tag_pins(self, name: str) -> dict[str, int] | None:
        """The {table -> snapshot_id} map of a tag, or None if absent."""
        _check_tag_name(name)
        path = os.path.join(self.root, "tags", f"{name}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return {k: int(v) for k, v in json.load(f).items()}
