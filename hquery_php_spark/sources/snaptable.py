"""Snapshot-manifest table: Iceberg-semantics commits over parquet.

The north rule reads "per-partition lineage/metrics checkpointed to
Iceberg so the job resumes idempotently".  The engine's original resume
path (``read_done_ids`` + row-level anti-join, reader.py:86) is correct
but O(corpus): at 10^12 committed documents the anti-join re-shuffles
every committed doc_id on every resume.  This module supplies the
mechanism Iceberg actually uses — an atomic **snapshot manifest** — so
resume cost is O(#batches), independent of row count:

* data files are staged under unique, commit-scoped directories; a
  reader never lists the data directory, it reads exactly the files
  named by the current snapshot manifest.  Files staged by a job that
  died before its snapshot commit are invisible (no torn reads, no
  cleanup needed for correctness — orphans are garbage, not danger);
* a snapshot is ONE small JSON document (`snaps/snap-%08d.json`)
  created atomically via hardlink-from-temp (``os.link`` fails with
  EEXIST when the sequence number is taken → optimistic retry, the
  same compare-and-swap Iceberg does with a conditional catalog swap /
  object-store conditional PUT);
* every append carries a caller-chosen ``batch_id`` plus a lineage
  dict (row counts, input split, timings).  Committing a batch_id that
  is already in the table is a **no-op**, so a killed-and-resubmitted
  job replays its batch plan and skips committed work by set
  difference over batch ids — never by scanning data.

Scale notes (10^12 docs, 1000 executors): the manifest lists file
paths, not rows — a 4096-batch ingest is 4096 snapshot JSONs of a few
KB each; ``committed_batches()`` reads only the latest manifest
(cumulative batch set is carried forward on every commit, so resume is
one small file read, not a log replay).  Readers pass the file list
straight to the parquet scan, so predicate pushdown / column pruning
behave exactly as a plain parquet read.

This is deliberately the smallest useful subset of the Iceberg spec
(single table, no schema evolution, no row-level deletes; appends plus
the maintenance actions — compaction, snapshot expiry, orphan GC — and
manifest-stats file skipping on reads); when a
real Iceberg catalog is configured, ``reader.read_documents`` already
scans catalog tables and jobs should prefer it.  The point here is the
commit/resume *protocol* and its tests.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Dict, List, Optional, Set

from pyspark.sql import DataFrame, SparkSession

__all__ = ["SnapTable"]

_SNAP_FMT = "snap-%08d.json"


class SnapTable:
    """Append-only snapshot table at ``path`` (local/DFS-posix dir)."""

    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.snap_dir = os.path.join(path, "snaps")

    # ------------------------------------------------------------------
    # snapshot log

    def snapshots(self) -> List[dict]:
        """All committed snapshots, oldest first."""
        if not os.path.isdir(self.snap_dir):
            return []
        out = []
        for name in sorted(os.listdir(self.snap_dir)):
            if name.startswith("snap-") and name.endswith(".json"):
                with open(os.path.join(self.snap_dir, name)) as f:
                    out.append(json.load(f))
        return out

    def current_snapshot(self) -> Optional[dict]:
        if not os.path.isdir(self.snap_dir):
            return None
        best = None
        for name in os.listdir(self.snap_dir):
            if name.startswith("snap-") and name.endswith(".json"):
                n = int(name[5:-5])
                if best is None or n > best:
                    best = n
        if best is None:
            return None
        with open(os.path.join(self.snap_dir, _SNAP_FMT % best)) as f:
            return json.load(f)

    def committed_batches(self) -> Set[str]:
        """Batch ids already in the table — ONE manifest read, no data scan."""
        snap = self.current_snapshot()
        return set(snap["batch_ids"]) if snap else set()

    def lineage(self) -> Dict[str, dict]:
        """batch_id → lineage dict recorded at its commit."""
        snap = self.current_snapshot()
        return dict(snap.get("lineage", {})) if snap else {}

    def row_count(self) -> int:
        """Total committed rows — answered from the manifest's lineage
        (one small JSON read), no scan: COUNT(*) at 10^12 rows for free."""
        return sum(l.get("n_rows", 0) for l in self.lineage().values())

    # ------------------------------------------------------------------
    # write path

    def append(
        self,
        df: DataFrame,
        batch_id: str,
        lineage: Optional[dict] = None,
        allow_evolution: bool = False,
    ) -> dict:
        """Stage ``df`` as parquet, then atomically commit a snapshot.

        Idempotent on ``batch_id``: if the current snapshot already
        contains it, nothing is written and the current snapshot is
        returned unchanged (the caller's retry/resume loop needs no
        special-casing).  Raises ``ValueError`` on a schema mismatch
        with the table's recorded schema (names+types, order-blind).

        ``allow_evolution=True`` permits ADDITIVE evolution (Iceberg
        add-column): extra top-level fields in ``df`` widen the table
        schema, and files written before the addition read back as NULL
        for the new columns (read() scans with the explicit manifest
        schema).  Dropping or re-typing existing fields is always an
        error — this table does type widening nowhere.
        """
        def _resolve_schema(snap: Optional[dict]) -> str:
            """Validate df against the CURRENT table schema and return the
            schema the new snapshot should carry.  Called fresh on every
            CAS attempt: a lost race means another writer may have evolved
            the schema (or created the table) since the last read, and a
            decision made against the stale snapshot would commit a wrong
            or unvalidated schema."""
            if snap is None:
                return df.schema.json()
            table_fields = json.loads(snap["schema"])["fields"]
            want = _schema_key(json.loads(snap["schema"]))
            have_json = json.loads(df.schema.json())
            have = _schema_key(have_json)
            if want == have:
                return snap["schema"]
            # additive only: every table (name, type) must appear
            # unchanged in df (a re-typed field fails the subset test
            # — a df cannot carry the same name twice)
            if not (allow_evolution and want <= have):
                raise ValueError(
                    "schema mismatch vs table %s: table=%s df=%s"
                    % (self.path, sorted(want), sorted(have))
                )
            known = {f["name"] for f in table_fields}
            new_fields = [
                f for f in have_json["fields"] if f["name"] not in known
            ]
            return json.dumps({**have_json, "fields": table_fields + new_fields})

        snap = self.current_snapshot()
        if snap and batch_id in snap["batch_ids"]:
            return snap
        _resolve_schema(snap)  # fail fast BEFORE paying for the staging write

        # 1. stage data under a unique dir — invisible until the snapshot
        #    commit below; a crash here leaves only orphan files.
        t0 = time.time()
        stage_rel = os.path.join("data", "b-%s-%s" % (batch_id, uuid.uuid4().hex))
        stage_abs = os.path.join(self.path, stage_rel)
        df.write.mode("error").parquet(stage_abs)
        files = sorted(
            os.path.join(stage_rel, f)
            for f in os.listdir(stage_abs)
            if f.endswith(".parquet")
        )
        n_rows = _staged_row_count(stage_abs)
        stats = _file_stats(self.path, files)

        # 2. commit: optimistic create-exclusive of the next sequence
        #    number; EEXIST ⇒ somebody else committed — re-read, re-check
        #    idempotence, retry at N+1.
        while True:
            snap = self.current_snapshot()
            if snap and batch_id in snap["batch_ids"]:
                return snap  # concurrent duplicate won the race — no-op
            seq = (snap["snapshot_id"] + 1) if snap else 1
            new = {
                "snapshot_id": seq,
                "parent": snap["snapshot_id"] if snap else None,
                # re-validated per attempt against the FRESH snapshot — a
                # lost CAS may mean the schema evolved under us
                "schema": _resolve_schema(snap),
                # compaction rewrites the per-batch dir layout for good;
                # later appends must keep saying so (fsck switches its
                # row-attribution strategy on this)
                "layout": snap.get("layout", "batch") if snap else "batch",
                # cumulative: resume reads ONLY the latest manifest
                "files": (snap["files"] if snap else []) + files,
                # per-file min/max from parquet footers (free — no data
                # read): lets read() skip whole files driver-side, the
                # Iceberg manifest-stats file-pruning mechanism
                "file_stats": {
                    **(snap.get("file_stats", {}) if snap else {}),
                    **stats,
                },
                "batch_ids": sorted(set(snap["batch_ids"]) | {batch_id})
                if snap
                else [batch_id],
                "lineage": {
                    **(snap.get("lineage", {}) if snap else {}),
                    batch_id: {
                        **(lineage or {}),
                        "n_rows": n_rows,
                        "n_files": len(files),
                        "wall_s": round(time.time() - t0, 3),
                    },
                },
                "committed_at": time.time(),
            }
            if self._try_commit(seq, new):
                return new

    def _try_commit(self, seq: int, snap: dict) -> bool:
        os.makedirs(self.snap_dir, exist_ok=True)
        tmp = os.path.join(self.snap_dir, ".tmp-%s" % uuid.uuid4().hex)
        final = os.path.join(self.snap_dir, _SNAP_FMT % seq)
        with open(tmp, "w") as f:
            json.dump(snap, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # atomic create-if-absent (CAS)
            return True
        except FileExistsError:
            return False  # lost the race — caller re-reads and retries
        finally:
            os.unlink(tmp)

    # ------------------------------------------------------------------
    # maintenance: compaction + expiry (the small-file problem)

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 << 20,
        min_files: int = 2,
    ) -> Optional[dict]:
        """Rewrite the current file set into ~target-sized files.

        Many batch commits → many small parquet files → scan-planning
        and open() overhead dominate at scale; Iceberg solves this with
        a rewrite-data-files action and so does this.  The compacted
        snapshot REPLACES the file list but carries the cumulative
        batch_ids and lineage forward, so manifest resume is unaffected.
        Older snapshots still reference the original files (time travel
        keeps working) until ``expire_snapshots`` reclaims them.
        Returns the new snapshot, or None when there was nothing to do.
        """
        snap = self.current_snapshot()
        if snap is None or len(snap["files"]) < min_files:
            return None
        total = sum(
            os.path.getsize(os.path.join(self.path, f)) for f in snap["files"]
        )
        n_out = max(1, -(-total // target_file_bytes))  # ceil
        if n_out >= len(snap["files"]):
            return None  # already at-or-below target granularity
        df = self.read(spark).coalesce(int(n_out))  # no shuffle
        stage_rel = os.path.join("data", "compact-%s" % uuid.uuid4().hex)
        stage_abs = os.path.join(self.path, stage_rel)
        df.write.mode("error").parquet(stage_abs)
        files = sorted(
            os.path.join(stage_rel, f)
            for f in os.listdir(stage_abs)
            if f.endswith(".parquet")
        )
        while True:
            cur = self.current_snapshot()
            if cur["snapshot_id"] != snap["snapshot_id"]:
                return None  # concurrent commit — drop this rewrite, retry later
            seq = cur["snapshot_id"] + 1
            new = {
                **cur,
                "snapshot_id": seq,
                "parent": cur["snapshot_id"],
                "files": files,
                "file_stats": _file_stats(self.path, files),
                "compaction_of": cur["snapshot_id"],
                "layout": "compacted",  # sticky: appends carry it forward
                "committed_at": time.time(),
            }
            if self._try_commit(seq, new):
                return new

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop all but the newest ``keep_last`` snapshots and delete
        data files referenced ONLY by the dropped ones (post-compaction
        space reclaim).  Never touches unreferenced staging dirs — a
        crashed-writer orphan might be an in-flight commit; that cleanup
        is a separate age-based sweep (``remove_orphans``)."""
        snaps = self.snapshots()
        if len(snaps) <= keep_last:
            return {"snapshots_dropped": 0, "files_deleted": 0}
        kept, dropped = snaps[-keep_last:], snaps[:-keep_last]
        live = {f for s in kept for f in s["files"]}
        dead = {f for s in dropped for f in s["files"]} - live
        # manifests FIRST, files second: a crash in between leaves only
        # unreferenced files (harmless orphans a later sweep reclaims) —
        # the reverse order would leave listed snapshots whose scans
        # explode on deleted paths
        for s in dropped:
            os.unlink(os.path.join(self.snap_dir, _SNAP_FMT % s["snapshot_id"]))
        emptied = set()
        for f in sorted(dead):
            p = os.path.join(self.path, f)
            if os.path.exists(p):
                os.unlink(p)
            emptied.add(os.path.dirname(p))
        for d in emptied:  # drop dirs holding only write markers now
            if os.path.isdir(d) and not any(
                e.endswith(".parquet") for e in os.listdir(d)
            ):
                import shutil

                shutil.rmtree(d)
        return {"snapshots_dropped": len(dropped), "files_deleted": len(dead)}

    def remove_orphans(self, older_than_s: float = 86400.0) -> int:
        """Delete staging dirs never referenced by ANY snapshot and older
        than the grace window (Iceberg's remove-orphan-files): leftovers
        of jobs that died between staging and their snapshot commit."""
        snaps = self.snapshots()
        referenced = {
            os.path.join(self.path, f).rsplit(os.sep, 1)[0]
            for s in snaps
            for f in s["files"]
        }
        n = 0
        now = time.time()
        if not os.path.isdir(self.data_dir):
            return 0
        for d in sorted(os.listdir(self.data_dir)):
            p = os.path.join(self.data_dir, d)
            if p in referenced or not os.path.isdir(p):
                continue
            if now - os.path.getmtime(p) < older_than_s:
                continue
            import shutil

            shutil.rmtree(p)
            n += 1
        return n

    def fsck(self) -> dict:
        """Integrity check of the current snapshot against the filesystem:
        every manifest-listed file must exist, and per-batch footer row
        counts must equal the lineage recorded at commit time.  Footer
        metadata only — no data pages, no Spark job.  Compaction rewrites
        the file layout, so per-batch row reconciliation is only possible
        on uncompacted tables; after a compact only the total is checked.
        """
        import pyarrow.parquet as pq

        snap = self.current_snapshot()
        if snap is None:
            return {"ok": True, "missing_files": [], "batch_mismatches": []}
        missing = [
            f
            for f in snap["files"]
            if not os.path.exists(os.path.join(self.path, f))
        ]
        rows_by_batch: Dict[str, int] = {}
        total_rows = 0
        for f in snap["files"]:
            p = os.path.join(self.path, f)
            if not os.path.exists(p):
                continue
            n = pq.ParquetFile(p).metadata.num_rows
            total_rows += n
            # uncompacted layout: data/b-<batch_id>-<uuid32>/part-*.parquet
            d = os.path.basename(os.path.dirname(f))
            if d.startswith("b-"):
                rows_by_batch[d[2:-33]] = rows_by_batch.get(d[2:-33], 0) + n
        lineage = snap.get("lineage", {})
        expected_total = sum(l.get("n_rows", 0) for l in lineage.values())
        mismatches = []
        if snap.get("layout", "batch") == "compacted" or "compaction_of" in snap:
            if not missing and total_rows != expected_total:
                mismatches.append(
                    {"batch": "__total__", "expected": expected_total,
                     "found": total_rows}
                )
        else:
            for bid, l in lineage.items():
                got = rows_by_batch.get(bid, 0)
                if got != l.get("n_rows", 0):
                    mismatches.append(
                        {"batch": bid, "expected": l.get("n_rows", 0),
                         "found": got}
                    )
        return {
            "ok": not missing and not mismatches,
            "missing_files": missing,
            "batch_mismatches": mismatches,
        }

    # ------------------------------------------------------------------
    # read path

    def read(
        self,
        spark: SparkSession,
        snapshot_id: Optional[int] = None,
        between: Optional[tuple] = None,
    ) -> Optional[DataFrame]:
        """Scan the table as of the current (or a past) snapshot.

        Returns None for an empty table.  The scan is handed the exact
        manifest file list — pushdown/pruning work as with any parquet
        read, and files from uncommitted (crashed) writers can never
        appear.

        ``between=(col, lo, hi)`` additionally prunes files whose
        footer-derived [min, max] for ``col`` cannot intersect [lo, hi]
        BEFORE the scan is planned (manifest-stats file skipping): a
        point/range lookup on a 10^12-row table touches only the files
        that can contain it.  Files without recorded stats are kept
        (pruning is only ever an optimization), and the row-level
        predicate is still applied for exactness.
        """
        if snapshot_id is None:
            snap = self.current_snapshot()
        else:
            p = os.path.join(self.snap_dir, _SNAP_FMT % snapshot_id)
            if not os.path.exists(p):
                raise ValueError("no snapshot %d in %s" % (snapshot_id, self.path))
            with open(p) as f:
                snap = json.load(f)
        if snap is None:
            return None
        files = snap["files"]
        if between is not None:
            col, lo, hi = between
            stats = snap.get("file_stats", {})
            files = [
                f
                for f in files
                if not _prunable(stats.get(f, {}).get(col), lo, hi)
            ]
        paths = [os.path.join(self.path, f) for f in files]
        schema = _schema_from_json(snap["schema"])
        if not paths:
            df = spark.createDataFrame([], schema=schema)
        else:
            # explicit manifest schema (not footer inference): files
            # written before an additive evolution read as NULL for the
            # later-added columns, and the column order is stable
            df = spark.read.schema(schema).parquet(*paths)
        if between is not None:
            from pyspark.sql import functions as F

            col, lo, hi = between
            df = df.where(F.col(col).between(F.lit(lo), F.lit(hi)))
        return df

    def pruned_file_count(self, between: tuple) -> tuple:
        """(files kept, files total) for a between predicate — lets tests
        and operators assert manifest pruning without running a scan."""
        snap = self.current_snapshot()
        if snap is None:
            return (0, 0)
        col, lo, hi = between
        stats = snap.get("file_stats", {})
        kept = [
            f
            for f in snap["files"]
            if not _prunable(stats.get(f, {}).get(col), lo, hi)
        ]
        return (len(kept), len(snap["files"]))


def _all_nullable(t):
    """Nullability-normalized copy of a schema-JSON node: parquet reads
    are all-nullable anyway, so nullable flags must neither fail the
    schema-compat check nor leak non-null promises into read schemas."""
    if isinstance(t, dict):
        out = {}
        for k, v in t.items():
            if k in ("nullable", "containsNull", "valueContainsNull"):
                out[k] = True
            else:
                out[k] = _all_nullable(v)
        return out
    if isinstance(t, list):
        return [_all_nullable(x) for x in t]
    return t


def _schema_key(schema_json: dict) -> Set[tuple]:
    return {
        (f["name"], json.dumps(_all_nullable(f["type"]), sort_keys=True))
        for f in schema_json["fields"]
    }


def _schema_from_json(s: str):
    from pyspark.sql.types import StructType

    return StructType.fromJson(_all_nullable(json.loads(s)))


def _prunable(mm, lo, hi) -> bool:
    """True when a file's [min, max] provably misses [lo, hi].  Any
    doubt (no stats, type mismatch with the predicate) keeps the file —
    pruning must only ever drop files that provably cannot match."""
    if not mm or mm[0] is None or mm[1] is None:
        return False
    try:
        return bool(mm[1] < lo or mm[0] > hi)
    except TypeError:
        return False


def _file_stats(root: str, rel_files: List[str]) -> Dict[str, dict]:
    """Per-file {col: [min, max]} from parquet footer row-group stats —
    metadata only, no data pages read.  Only JSON-safe scalar types are
    recorded (str/int/float/bool); columns without footer stats are
    skipped, which read() treats as un-prunable."""
    import pyarrow.parquet as pq

    out: Dict[str, dict] = {}
    for rel in rel_files:
        md = pq.ParquetFile(os.path.join(root, rel)).metadata
        cols: Dict[str, list] = {}
        dead: set = set()  # any row group without stats ⇒ column unusable
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if "." in name or name in dead:  # nested / already invalid
                    continue
                st = c.statistics
                mn = mx = None
                if st is not None and st.has_min_max:
                    mn, mx = st.min, st.max
                    if isinstance(mn, bytes):
                        try:
                            mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                        except UnicodeDecodeError:
                            mn = None
                    if not isinstance(mn, (str, int, float, bool)):
                        mn = None
                    elif isinstance(mn, float) and (mn != mn or mx != mx):
                        mn = None  # NaN stats are meaningless for ranges
                if mn is None:
                    dead.add(name)
                    cols.pop(name, None)
                    continue
                if name in cols:
                    cols[name] = [min(cols[name][0], mn), max(cols[name][1], mx)]
                else:
                    cols[name] = [mn, mx]
        if cols:
            out[rel] = cols
    return out


def _staged_row_count(stage_abs: str) -> int:
    """Row count from parquet footers — no Spark job, no data read."""
    import pyarrow.parquet as pq

    n = 0
    for f in os.listdir(stage_abs):
        if f.endswith(".parquet"):
            n += pq.ParquetFile(os.path.join(stage_abs, f)).metadata.num_rows
    return n
