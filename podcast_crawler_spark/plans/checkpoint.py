"""Snapshot-manifest table format — Iceberg-shaped checkpointing.

No Iceberg runtime jar / pyiceberg exists in this sandbox (SURVEY.md §7.0),
so this is a thin warehouse layer with Iceberg's *semantics*: immutable
parquet data files + JSON snapshot manifests giving *atomic commits*,
*time travel* and *exact resume*.  In production the same call sites swap to
a real Iceberg catalog (``df.writeTo(...)`` + ``MERGE INTO``) — the epoch
loop only touches the four methods below.

Layout per table::

    <root>/<name>/data/snap-<n>/part-*.parquet     (immutable)
    <root>/<name>/_snapshots/<n>.json              (manifest, atomic rename)

Manifest fields: snapshot_id, parent_id, data_dir, row_count,
per-partition lineage (file, rows, bytes) and caller metrics — the
north rule's "per-partition lineage + metrics".  A commit is the atomic
rename of the manifest into ``_snapshots/``; readers resolve the highest
committed id, so a killed writer leaves no torn state (the orphan data dir
is ignored and overwritten on retry).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def resolve_lww(df: DataFrame, key: str, order_col: str) -> DataFrame:
    """Last-write-wins resolution on *key*: argmax per key over *order_col*
    as a ``max_by(struct(*), order)`` hash aggregation — one exchange with
    map-side partial aggregation, no sort (see epoch.py upsert notes)."""
    row = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(key)
        .agg(F.max_by(row, F.col(order_col)).alias("_row"))
        .select("_row.*")
    )


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.snap_dir = os.path.join(self.dir, "_snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)

    # -- manifest bookkeeping ------------------------------------------------

    def snapshot_ids(self) -> List[int]:
        ids = []
        for f in os.listdir(self.snap_dir):
            if f.endswith(".json"):
                try:
                    ids.append(int(f[:-5]))
                except ValueError:
                    continue
        return sorted(ids)

    def current_snapshot_id(self) -> Optional[int]:
        ids = self.snapshot_ids()
        return ids[-1] if ids else None

    def manifest(self, snapshot_id: Optional[int] = None) -> Optional[Dict]:
        if snapshot_id is None:
            snapshot_id = self.current_snapshot_id()
        if snapshot_id is None:
            return None
        with open(os.path.join(self.snap_dir, f"{snapshot_id}.json")) as fh:
            return json.load(fh)

    # -- commit / read -------------------------------------------------------

    def prepare(self, df: DataFrame) -> Dict:
        """Phase 1 of a two-phase commit: write the data files and gather
        per-partition lineage, WITHOUT publishing a manifest.  Readers see
        nothing until ``publish`` renames the manifest in — so a prepare
        can safely overlap other tables' commits even when the commit
        *protocol* orders this table's publication after theirs (the epoch
        loop overlaps the frontier's big parquet write with the output
        commits and publishes its manifest last).  A crash between prepare
        and publish leaves only an orphan data dir that the idempotent
        retry overwrites."""
        parent = self.current_snapshot_id()
        snap_id = (parent or 0) + 1
        data_dir = os.path.join(self.dir, "data", f"snap-{snap_id}")
        df.write.mode("overwrite").parquet(data_dir)
        # per-partition lineage from the parquet footers — no extra Spark
        # job; row counts come from file metadata (cheap local reads)
        import pyarrow.parquet as pq

        files = []
        for f in sorted(os.listdir(data_dir)):
            if f.endswith(".parquet"):
                p = os.path.join(data_dir, f)
                files.append(
                    {
                        "file": f,
                        "bytes": os.path.getsize(p),
                        "rows": pq.ParquetFile(p).metadata.num_rows,
                    }
                )
        return {
            "snapshot_id": snap_id,
            "parent_id": parent,
            "data_dir": data_dir,
            "row_count": sum(f["rows"] for f in files),
            "files": files,
        }

    def publish(self, staged: Dict, metrics: Optional[Dict] = None) -> int:
        """Phase 2: atomically publish a prepared snapshot (write-tmp +
        rename — the commit point).  Refuses if another snapshot committed
        since prepare (single-writer-per-table protocol)."""
        snap_id = staged["snapshot_id"]
        current = self.current_snapshot_id()
        if current is not None and current >= snap_id:
            raise RuntimeError(
                f"snapshot {current} committed since prepare of {snap_id}"
            )
        man = dict(staged)
        man["committed_at_unix"] = time.time()
        man["metrics"] = metrics or {}
        tmp = os.path.join(self.snap_dir, f".{snap_id}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(man, fh, indent=1)
        os.rename(tmp, os.path.join(self.snap_dir, f"{snap_id}.json"))
        return snap_id

    def commit(self, df: DataFrame, metrics: Optional[Dict] = None) -> int:
        """Write *df* as the next snapshot; returns the new snapshot id.
        The manifest lands via write-tmp + atomic rename **after** the data
        files are fully written — a crash mid-write is invisible to
        readers (exact-resume property, tested in test_checkpoint.py)."""
        return self.publish(self.prepare(df), metrics=metrics)

    def commit_local(
        self,
        rows: List[tuple],
        arrow_schema,
        metrics: Optional[Dict] = None,
        carry_previous: bool = True,
    ) -> int:
        """Commit a small snapshot entirely driver-side via pyarrow — no
        Spark job.  Used for tiny control tables (per-epoch metrics): at
        one row per epoch a Spark write costs a full job-scheduling round
        trip per epoch for kilobytes of data.  ``carry_previous`` appends
        the previous snapshot's rows (append-only table semantics)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        parent = self.current_snapshot_id()
        snap_id = (parent or 0) + 1
        data_dir = os.path.join(self.dir, "data", f"snap-{snap_id}")
        os.makedirs(data_dir, exist_ok=True)
        tables = []
        if carry_previous and parent is not None:
            prev = self.manifest(parent)
            for f in prev["files"]:
                tables.append(
                    pq.read_table(os.path.join(prev["data_dir"], f["file"]))
                )
        tables.append(
            pa.Table.from_pylist(
                [dict(zip([f.name for f in arrow_schema], r)) for r in rows],
                schema=arrow_schema,
            )
        )
        table = pa.concat_tables(tables)
        path = os.path.join(data_dir, "part-00000.parquet")
        pq.write_table(table, path)
        files = [
            {
                "file": "part-00000.parquet",
                "bytes": os.path.getsize(path),
                "rows": table.num_rows,
            }
        ]
        man = {
            "snapshot_id": snap_id,
            "parent_id": parent,
            "committed_at_unix": time.time(),
            "data_dir": data_dir,
            "row_count": table.num_rows,
            "files": files,
            "metrics": metrics or {},
        }
        tmp = os.path.join(self.snap_dir, f".{snap_id}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(man, fh, indent=1)
        os.rename(tmp, os.path.join(self.snap_dir, f"{snap_id}.json"))
        return snap_id

    def commit_delta(
        self,
        updates: DataFrame,
        key: str,
        order_col: str,
        metrics: Optional[Dict] = None,
    ) -> int:
        """Merge-on-read commit: write ONLY the delta (this epoch's upsert
        rows) as a new segment; reads resolve last-write-wins on *key*
        across all segments.  This is how an upsert table stays O(delta)
        per epoch instead of O(table) — the copy-on-write rewrite of a
        10^10-row episodes table to apply a 10^5-row epoch would be the
        bottleneck of the whole crawl (Iceberg calls the same idea MOR
        delete/equality files; ``compact`` below is the rewrite).

        If no base snapshot exists this degrades to a plain ``commit``
        (with resolve metadata recorded so later deltas know the key)."""
        parent = self.current_snapshot_id()
        parent_man = self.manifest(parent) if parent is not None else None
        snap_id = (parent or 0) + 1
        data_dir = os.path.join(self.dir, "data", f"snap-{snap_id}")
        updates.write.mode("overwrite").parquet(data_dir)
        import pyarrow.parquet as pq

        files = []
        for f in sorted(os.listdir(data_dir)):
            if f.endswith(".parquet"):
                p = os.path.join(data_dir, f)
                files.append(
                    {
                        "file": f,
                        "bytes": os.path.getsize(p),
                        "rows": pq.ParquetFile(p).metadata.num_rows,
                    }
                )
        delta_rows = sum(f["rows"] for f in files)
        if parent_man is None:
            segments = [data_dir]
            raw_rows = delta_rows
        else:
            segments = (
                parent_man.get("segments") or [parent_man["data_dir"]]
            ) + [data_dir]
            raw_rows = parent_man["row_count"] + delta_rows
        man = {
            "snapshot_id": snap_id,
            "parent_id": parent,
            "committed_at_unix": time.time(),
            "data_dir": data_dir,
            "segments": segments,
            "resolve": {"key": key, "order_col": order_col},
            # raw (pre-resolve) rows across segments — an upper bound on
            # the resolved count, like Iceberg's file-level stats
            "row_count": raw_rows,
            "delta_rows": delta_rows,
            "files": files,
            "metrics": metrics or {},
        }
        tmp = os.path.join(self.snap_dir, f".{snap_id}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(man, fh, indent=1)
        os.rename(tmp, os.path.join(self.snap_dir, f"{snap_id}.json"))
        return snap_id

    def expire(
        self,
        retain_last: int = 2,
        max_age_s: Optional[float] = None,
        now: Optional[float] = None,
    ) -> Dict:
        """Expire old snapshots (Iceberg ``expire_snapshots``): drop
        manifests outside the retention rule (keep the newest
        *retain_last* ids, plus everything younger than *max_age_s*),
        then delete exactly the data segments no RETAINED snapshot
        references — merge-on-read lineage means an old delta segment
        stays alive as long as any kept snapshot's ``segments`` list
        includes it, so reachability (not age) decides file deletion;
        time travel to an expired id fails loudly afterwards.

        Driver-side by design: the manifest set is O(commits), the same
        scale at which Iceberg's own expire action plans (the
        DataFrame-shaped planner for fleet-wide listings is
        :func:`snapshot_expiry_plan`).  Returns
        ``{"expired": [...], "deleted_dirs": [...]}``."""
        import shutil

        ids = self.snapshot_ids()
        if not ids:
            return {"expired": [], "deleted_dirs": []}
        now = time.time() if now is None else now
        kept = set(ids[-max(retain_last, 1):])
        if max_age_s is not None:
            for sid in ids:
                man = self.manifest(sid)
                if man and now - man["committed_at_unix"] <= max_age_s:
                    kept.add(sid)
        reachable = set()
        for sid in kept:
            man = self.manifest(sid)
            reachable.update(man.get("segments") or [man["data_dir"]])
        expired = [sid for sid in ids if sid not in kept]
        deleted = []
        for sid in expired:
            man = self.manifest(sid)
            # manifest first: a crash between the two deletes leaves an
            # orphan data dir (harmless, re-collected next expire), never
            # a manifest pointing at deleted data.
            os.remove(os.path.join(self.snap_dir, f"{sid}.json"))
            for seg in man.get("segments") or [man["data_dir"]]:
                if seg not in reachable and os.path.isdir(seg):
                    shutil.rmtree(seg)
                    deleted.append(seg)
                    reachable.add(seg)  # counted once
        return {"expired": expired, "deleted_dirs": sorted(set(deleted))}

    def num_segments(self) -> int:
        man = self.manifest()
        if man is None:
            return 0
        return len(man.get("segments") or [man["data_dir"]])

    def compact(self, spark: SparkSession, metrics: Optional[Dict] = None) -> int:
        """Materialize the resolved view as a single-segment snapshot —
        merge-on-read's periodic rewrite, amortizing resolve cost across
        epochs instead of paying a full-table write every epoch."""
        resolved = self.read(spark)
        m = dict(metrics or {})
        m.setdefault("op", "compact")
        return self.commit(resolved, metrics=m)

    def read(
        self, spark: SparkSession, snapshot_id: Optional[int] = None
    ) -> Optional[DataFrame]:
        """Read the current snapshot, or time-travel to *snapshot_id*.
        Delta snapshots resolve LWW across their segments at read time."""
        man = self.manifest(snapshot_id)
        if man is None:
            return None
        segments = man.get("segments") or [man["data_dir"]]
        reader = spark.read
        if len(segments) > 1:
            # delta segments may carry evolved schemas (a later ingest
            # version adding a column); merge them so older segments read
            # with nulls in the new column — Iceberg's add-column
            # semantics.  Single-segment reads skip the footer merge cost.
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*segments)
        res = man.get("resolve")
        if res and len(segments) > 1:
            df = resolve_lww(df, res["key"], res["order_col"])
        return df


def snapshot_expiry_plan(
    snapshots: DataFrame,
    refs: DataFrame,
    retain_last: int,
    max_age_s: int,
    now_ts: int,
) -> DataFrame:
    """Fleet-wide snapshot-expiry planning as DataFrames — which data
    segments are DELETABLE given a retention rule, across a listing of
    many tables' snapshot logs (``SnapshotTable.expire`` is the
    single-table driver-side action; this is the audit/planning query a
    warehouse janitor runs over thousands of tables at once).

    Inputs: *snapshots* ``(snapshot_id, committed_ts)`` and *refs*
    ``(snapshot_id, segment)`` (one row per segment a snapshot can
    read — merge-on-read snapshots reference every live delta).  Rule:
    keep the newest *retain_last* ids plus everything with
    ``committed_ts ≥ now_ts − max_age_s``; a segment is deletable iff
    NO kept snapshot references it (reachability, not age).

    Output: ``(segment, n_refs, n_kept_refs, deletable)``.  The rank
    window is unpartitioned by design — its input is O(snapshots)
    (bounded by commit count, the manifest scale), while the
    reachability rollup on *refs* is a normal keyed aggregation that
    distributes over the segment space.
    """
    w = Window.orderBy(F.desc("snapshot_id"))
    kept = snapshots.select(
        "snapshot_id",
        (
            (F.row_number().over(w) <= retain_last)
            | (F.col("committed_ts") >= F.lit(now_ts - max_age_s))
        ).alias("keep"),
    )
    return (
        refs.join(kept, "snapshot_id", "left")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_refs"),
            F.sum(F.coalesce(F.col("keep").cast("long"), F.lit(0))).alias(
                "n_kept_refs"
            ),
        )
        .withColumn("deletable", F.col("n_kept_refs") == 0)
    )


def compaction_plan(
    files: DataFrame,
    part_col: str = "part",
    file_col: str = "file_id",
    size_col: str = "bytes",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-file compaction planner: assign each data file to an
    output file so outputs pack to ~*target_bytes*, never crossing a
    table partition (the Iceberg ``rewrite_data_files`` bin-packing
    contract — a merge-on-read table accumulates per-epoch delta files
    that this plan folds back into full-size files).

    Rule (exact integers, deterministic): within a partition, files in
    *file_col* order get an exclusive prefix sum of sizes
    (``start_offset``); ``target_file = start_offset div
    target_bytes``.  Concat-packing — the same rule as
    ``curation.pack_shards`` — so every output except a partition's
    last is ≥ target (an output crosses the boundary only by the file
    that straddles it), and the assignment is reproducible from the
    listing alone.

    Scale shape: ONE window exchange keyed by the table partition.
    Unlike ``pack_shards`` (corpus-wide packing → unbounded group →
    bucketed prefix-sum core), a partition's file list is bounded by
    the manifest (thousands of files), so the plain per-partition
    running sum is the right plan — no salting, no second pass.
    Output: ``(part, file_id, bytes, start_offset, target_file)``.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    return files.select(
        F.col(part_col),
        F.col(file_col),
        F.col(size_col).cast("long").alias(size_col),
        start.alias("start_offset"),
    ).withColumn(
        "target_file",
        F.expr(f"start_offset div {int(target_bytes)}").cast("long"),
    )
