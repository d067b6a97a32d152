"""Table catalog abstraction — Iceberg when the runtime jar is present,
transparent Parquet-directory fallback otherwise (SURVEY.md §7 [ENV]: no
iceberg-spark-runtime jar on this box; BASELINE.json:14 mandates Iceberg in
production).

The fallback preserves the two Iceberg semantics the engine relies on:
* atomic append per batch — staged `_tmp-<uuid>` dir renamed into place,
  readers list only committed dirs via the JSON manifest;
* snapshot read — a read lists the manifest first, so a concurrent
  half-written append is invisible.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j returns a silent JavaPackage for unknown attrs, so probe the
        # classloader explicitly
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Schema")
        return True
    except Exception:
        return False


# write-option prefix Iceberg's Spark integration maps into snapshot
# summary properties (public Iceberg docs, spark-writes: snapshot-property.*)
_SNAP_PROP_PREFIX = "snapshot-property."
_TAG_PROP = "tilers.tag"


class Catalog:
    """Minimal write/read/append facade over Iceberg-or-Parquet.

    `use_iceberg=None` probes the JVM classpath; tests inject True/False
    explicitly (the Iceberg path is developed against mocked writers — no
    iceberg-spark-runtime jar on this box, SURVEY.md §7 [ENV])."""

    def __init__(self, spark: SparkSession, root: str, use_iceberg: bool | None = None):
        self.spark = spark
        self.root = root
        self.use_iceberg = iceberg_available(spark) if use_iceberg is None else use_iceberg

    # -- fallback manifest helpers ------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_manifest.json")

    def _entries(self, table: str) -> list[dict]:
        """Manifest entries [{dir, tag, partition_by}]; plain-string
        commits (v1) and tag-only dicts (v2) are upgraded on read."""
        mf = self._manifest(table)
        if not os.path.exists(mf):
            return []
        with open(mf) as f:
            raw = json.load(f)["commits"]
        out = []
        for e in raw:
            if not isinstance(e, dict):
                e = {"dir": e, "tag": None}
            # None = layout UNKNOWN (manifest predates the field) —
            # distinct from [] = recorded-unpartitioned; compact() treats
            # unknown conservatively (directory sniff / explicit arg)
            e.setdefault("partition_by", None)
            out.append(e)
        return out

    def _commits(self, table: str) -> list[str]:
        return [e["dir"] for e in self._entries(table)]

    def _write_manifest(self, table: str, entries: list[dict]) -> None:
        mf = self._manifest(table)
        tmp = mf + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"commits": entries}, f)
        os.replace(tmp, mf)  # atomic on POSIX

    def _commit(
        self, table: str, batch_dir: str, tag: dict | None = None,
        partition_by: tuple[str, ...] = (),
    ):
        entries = self._entries(table)
        entries.append({"dir": batch_dir, "tag": tag, "partition_by": list(partition_by)})
        self._write_manifest(table, entries)

    # -- public API ----------------------------------------------------
    def append(self, df: DataFrame, table: str, partition_by: tuple[str, ...] = (), tag: dict | None = None) -> None:
        """Atomic batch append. `tag`: a small JSON dict recorded with the
        commit — used by plans for crash reconciliation (e.g.
        {"run_id":..., "part_id":...}). Fallback path: stored in the
        manifest entry. Iceberg path: carried as the `tilers.tag` snapshot
        summary property via the public `snapshot-property.*` write option,
        so `rollback_where` can identify orphan snapshots after a crash."""
        if self.use_iceberg:
            # Iceberg append() requires an existing table (unlike the
            # parquet fallback); probe existence explicitly rather than
            # catching append()'s exception, which would mask real failures
            # (schema drift, commit conflicts) behind a confusing
            # 'table already exists' from create()
            w = df.writeTo(table)
            if tag is not None:
                w = w.option(_SNAP_PROP_PREFIX + _TAG_PROP, json.dumps(tag, sort_keys=True))
            if self.spark.catalog.tableExists(table):
                w.append()
            else:
                w.create()
            return
        tdir = self._tdir(table)
        os.makedirs(tdir, exist_ok=True)
        batch = f"batch-{uuid.uuid4().hex}"
        staging = os.path.join(tdir, f"_tmp-{batch}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staging)
        final = os.path.join(tdir, batch)
        os.replace(staging, final)
        self._commit(table, batch, tag, partition_by)

    def rollback_where(self, table: str, pred) -> int:
        """Remove committed batches whose tag satisfies `pred(tag) -> bool`
        (tags of None are never matched). Returns the number of batches
        rolled back. Used to reconcile orphan batches — data committed but
        the paired checkpoint row missing after a crash — before re-running
        a part/zoom (plans.tile_pyramid / plans.merged_pyramid).

        Iceberg path: scans the table's current-ancestor snapshot chain
        (`<table>.history` joined to `<table>.snapshots` summaries),
        matches `pred` against the JSON `tilers.tag` summary property that
        `append` wrote, and rolls the table back past the matching TIP
        SUFFIX with one `system.rollback_to_snapshot` procedure call.
        Orphans are always a contiguous tip suffix under the engine's crash
        model (plans append a part's data, then its checkpoint row, in a
        driver loop — a crash strands only the most recent appends), so a
        matching snapshot found BELOW a non-matching one means the caller's
        predicate is wrong or the table was written outside the engine:
        that raises rather than silently rewriting history. Rolling back to
        before the first snapshot (every ancestor matches) also raises —
        Iceberg cannot roll back to an empty table; drop and re-create
        instead. Developed against mocked SQL/writer surfaces (no Iceberg
        jar offline, tests/test_iceberg_path.py); the parquet-fallback
        crash-injection test (tests/test_resume.py) is the behavioral spec.
        """
        if self.use_iceberg:
            return self._rollback_where_iceberg(table, pred)
        if not os.path.exists(self._manifest(table)):
            return 0
        entries = self._entries(table)
        keep, drop = [], []
        for e in entries:
            (drop if (e["tag"] is not None and pred(e["tag"])) else keep).append(e)
        if drop:
            self._write_manifest(table, keep)
            for e in drop:
                shutil.rmtree(os.path.join(self._tdir(table), e["dir"]), ignore_errors=True)
        return len(drop)

    def _rollback_where_iceberg(self, table: str, pred) -> int:
        """Tip-suffix snapshot rollback on the `tilers.tag` summary
        property (see rollback_where docstring). Uses only public Spark SQL
        surfaces — metadata tables + the rollback_to_snapshot procedure —
        so it is exercisable under a mocked `spark.sql` offline."""
        # snapshots that are ancestors of the current table state (abandoned
        # branches from earlier rollbacks excluded). NOT ordered by
        # made_current_at — same-millisecond commits tie, and a snapshot
        # re-made-current by a prior rollback appears TWICE in history —
        # instead dedupe by snapshot_id and walk the parent chain from the
        # tip (the unique ancestor that is no other ancestor's parent).
        rows = self.spark.sql(
            f"SELECT h.snapshot_id, s.parent_id, s.summary FROM {table}.history h "
            f"JOIN {table}.snapshots s ON h.snapshot_id = s.snapshot_id "
            f"WHERE h.is_current_ancestor"
        ).collect()
        by_id = {row["snapshot_id"]: row for row in rows}
        if not by_id:
            return 0  # table exists but has no snapshots yet: nothing to reconcile
        parents = {row["parent_id"] for row in by_id.values() if row["parent_id"] is not None}
        tips = [sid for sid in by_id if sid not in parents]
        if len(tips) != 1:
            raise RuntimeError(
                f"rollback_where({table}): cannot identify a unique tip in the "
                f"current-ancestor chain ({len(tips)} candidates of {len(by_id)} "
                "snapshots) — metadata inconsistency, refusing to roll back."
            )
        chain = []
        sid = tips[0]
        while sid is not None and sid in by_id:
            chain.append(by_id[sid])
            sid = by_id[sid]["parent_id"]
        n_drop = 0
        keep_target = None  # newest non-matching ancestor
        for row in chain:
            summary = row["summary"] or {}
            raw = summary.get(_TAG_PROP)
            tag = json.loads(raw) if raw is not None else None
            if keep_target is None and tag is not None and pred(tag):
                n_drop += 1
                continue
            if keep_target is None:
                # newest non-matching ancestor = the rollback target; keep
                # scanning older snapshots only for the non-tip guard below
                keep_target = row["snapshot_id"]
            if tag is not None and pred(tag):
                raise RuntimeError(
                    f"rollback_where({table}): snapshot {row['snapshot_id']} matches the "
                    "predicate but is not part of the tip suffix — orphans must be "
                    "contiguous at the tip under the engine's crash model; refusing to "
                    "rewrite non-tip history (reconcile manually)."
                )
        if n_drop == 0:
            return 0
        if keep_target is None:
            raise RuntimeError(
                f"rollback_where({table}): every snapshot in the current history matches "
                "the predicate — Iceberg cannot roll back to an empty table; "
                "drop() and re-create instead."
            )
        # 3-part identifier carries its catalog; procedures live under
        # <catalog>.system and take a catalog-relative table identifier
        parts = table.split(".")
        if len(parts) >= 3:
            proc_catalog, proc_table = parts[0], ".".join(parts[1:])
        else:
            proc_catalog, proc_table = self.spark.catalog.currentCatalog(), table
        self.spark.sql(
            f"CALL {proc_catalog}.system.rollback_to_snapshot('{proc_table}', {keep_target})"
        )
        return n_drop

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.format("iceberg").load(table)
        commits = self._commits(table)
        if not commits:
            raise FileNotFoundError(f"table {table} has no commits")
        from functools import reduce

        from pyspark.sql import DataFrame as _DF

        # each batch dir is its own partition-discovery root (the table dir
        # mixes batch-* dirs, which confuses a single basePath scan)
        dfs = [
            self.spark.read.option("basePath", os.path.join(self._tdir(table), c)).parquet(
                os.path.join(self._tdir(table), c)
            )
            for c in commits
        ]
        return reduce(_DF.unionByName, dfs)

    def compact(self, table: str, partition_by: tuple[str, ...] = ()) -> int:
        """Fallback-path manifest compaction: rewrite all committed batch
        dirs into ONE batch and atomically swap the manifest. A
        thousand-commit table otherwise makes read() build a
        thousand-relation unionByName plan — compaction restores a
        single-scan read. Returns the number of batches folded (0 = nothing
        to do). Iceberg path: no-op returning 0 (use the engine's own
        rewrite_data_files maintenance there).

        Run AFTER a pipeline run completes: the per-commit crash-
        reconciliation tags are intentionally dropped (they only matter for
        batches whose paired checkpoint row may be missing — a completed
        run has none), and the single writer assumption of the fallback
        applies (no concurrent appends during compaction).

        Partition layout is PRESERVED: appends record their partition_by
        in the manifest, and compaction reuses that layout when the caller
        doesn't pass one. Mixed recorded layouts raise; batches whose
        manifest PREDATES the layout field (layout unknown) are sniffed
        from their directory structure — a `col=value` subdir means
        partitioned, and without an explicit partition_by that also
        raises rather than silently flattening. Without this, compacting
        a z-partitioned tile table would lose the partition pruning the
        serving path relies on.

        The folded batch dirs are NOT deleted here: a concurrent reader
        may have planned against the old manifest (the snapshot-read
        contract), and deleting under its lazy scan would fail it
        mid-query. They become unreferenced orphans — run `gc(table)`
        after in-flight readers have drained to reclaim the space.
        """
        if self.use_iceberg:
            return 0
        entries = self._entries(table)
        if len(entries) <= 1:
            return 0
        if not partition_by:
            known = {tuple(e["partition_by"]) for e in entries if e["partition_by"] is not None}
            if len(known) > 1:
                raise ValueError(
                    f"compact({table}): batches carry mixed partition layouts "
                    f"{sorted(known)} — pass partition_by explicitly"
                )
            unknown = [e for e in entries if e["partition_by"] is None]
            for e in unknown:
                bdir = os.path.join(self._tdir(table), e["dir"])
                if os.path.isdir(bdir) and any(
                    "=" in d and os.path.isdir(os.path.join(bdir, d)) for d in os.listdir(bdir)
                ):
                    raise ValueError(
                        f"compact({table}): batch {e['dir']} looks partitioned but its "
                        "manifest entry predates layout recording — pass partition_by "
                        "explicitly to avoid silently flattening the table"
                    )
            partition_by = known.pop() if known else ()
        df = self.read(table)
        tdir = self._tdir(table)
        batch = f"batch-{uuid.uuid4().hex}"
        staging = os.path.join(tdir, f"_tmp-{batch}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staging)
        os.replace(staging, os.path.join(tdir, batch))
        # atomic manifest swap; the folded dirs stay on disk as
        # unreferenced orphans for gc() (see docstring re concurrent readers)
        self._write_manifest(
            table, [{"dir": batch, "tag": None, "partition_by": list(partition_by)}]
        )
        return len(entries)

    def gc(self, table: str) -> int:
        """Fallback-path orphan sweep: delete batch/staging dirs the
        manifest does not reference — debris from a crash between a
        staged write and its commit, or between compact()'s manifest swap
        and its rmtree pass. Orphans are invisible to readers (read()
        lists the manifest first), so gc is safe any time the single-
        writer assumption holds. Returns the number of dirs removed."""
        if self.use_iceberg:
            return 0
        tdir = self._tdir(table)
        if not os.path.isdir(tdir):
            return 0
        live = {e["dir"] for e in self._entries(table)}
        n = 0
        for d in os.listdir(tdir):
            full = os.path.join(tdir, d)
            if not os.path.isdir(full) or d in live:
                continue
            if d.startswith("batch-") or d.startswith("_tmp-"):
                shutil.rmtree(full, ignore_errors=True)
                n += 1
        return n

    def exists(self, table: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(table)
        return bool(self._commits(table))

    def drop(self, table: str) -> None:
        if self.use_iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS {table}")
            return
        shutil.rmtree(self._tdir(table), ignore_errors=True)
