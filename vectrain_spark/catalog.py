"""Iceberg-contract table catalog on partitioned Parquet + JSON manifests.

SURVEY.md §7: no Iceberg runtime jar is installed in this sandbox, so the
storage layer is a thin abstraction that emulates the parts of the Iceberg
contract the pipeline relies on:

* **snapshots**: every write creates ``data/snap-NNNNNN/`` plus an
  immutable manifest ``_manifest/snap-NNNNNN.json`` recording op
  (append/replace), parent, the cumulative data-dir list, and user metadata;
* **atomic commit**: manifest written to a temp file then ``os.rename``-ed,
  then the HEAD pointer (``_manifest/VERSION``) swapped the same way —
  readers only ever see a fully-committed snapshot;
* **append / replace**: append unions parents' data dirs; replace starts a
  new chain (used for derived tables rebuilt per run);
* **time travel**: ``read(..., snapshot_id=...)``.

On a real cluster this class is swapped for
``df.writeTo("db.tbl").append()`` with
``org.apache.iceberg:iceberg-spark-runtime`` — the pipeline only touches
the four methods below, so the swap is local to this file.

Reference analog: the Qdrant sink connect/ensure-collection/upsert cycle
(/root/reference/internal/app/storages/qdrant/client.go:55-68,
store.go:91-114) — with real commit atomicity instead of fire-and-forget
upserts.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Catalog:
    """Thread-safe: concurrent writers stage data files without a lock and
    serialize only the manifest commit (pipeline groups run concurrently)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._commit_lock = threading.Lock()

    # -- paths ---------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _mdir(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_manifest")

    def _version_file(self, table: str) -> str:
        return os.path.join(self._mdir(table), "VERSION")

    # -- manifest primitives --------------------------------------------
    def _head(self, table: str) -> int | None:
        """Committed head = highest snap id with a manifest file present.

        Derived from a directory listing, NOT the VERSION file: manifests
        become visible atomically (link/rename), and ids are allocated by
        winning the link on ``snap-N.json`` (see :meth:`_commit_manifest`),
        so max-present-id is exact even with several concurrent WRITER
        PROCESSES — whereas a lagging VERSION pointer written post-commit
        could hide a committed snapshot (lost update). VERSION remains as
        a best-effort human-readable hint only."""
        mdir = self._mdir(table)
        try:
            names = os.listdir(mdir)
        except FileNotFoundError:
            return None
        snaps = [
            int(n[5:11])
            for n in names
            if n.startswith("snap-") and n.endswith(".json") and n[5:11].isdigit()
        ]
        return max(snaps) if snaps else None

    def _commit_manifest(self, table: str, build) -> int | None:
        """Optimistic-concurrency commit, safe across PROCESSES (the
        Iceberg commit contract — retry on HEAD mismatch; reference
        analog: the external store's atomic upsert, qdrant/client.go:55-68).

        ``build(parent_id_or_None) -> manifest dict | None`` (None aborts,
        nothing committed). Loop: read head, build the manifest for id
        head+1, write it to a temp file, then ``os.link`` it to
        ``snap-{id}.json`` — link fails with EEXIST iff another writer
        committed that id first, in which case re-read head and rebuild on
        the new parent. The winner's manifest appears atomically; no
        update is ever lost, chains stay contiguous. The in-process lock
        is kept only to avoid needless same-process link contention."""
        mdir = self._mdir(table)
        os.makedirs(mdir, exist_ok=True)
        delay = 0.01
        while True:
            parent = self._head(table)
            manifest = build(parent)
            if manifest is None:
                return None
            snap = (parent + 1) if parent is not None else 1
            manifest = dict(
                manifest, snapshot_id=snap, parent=parent,
                committed_at=time.time(),
            )
            target = os.path.join(mdir, f"snap-{snap:06d}.json")
            tmp = f"{target}.tmp.{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                f.write(json.dumps(manifest, indent=1))
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, target)
            except FileExistsError:
                os.unlink(tmp)
                time.sleep(delay)
                delay = min(delay * 2, 0.2)
                continue
            os.unlink(tmp)
            # advisory pointer for humans; correctness never reads it
            self._atomic_write(self._version_file(table), str(snap))
            return snap

    def _manifest(self, table: str, snap: int) -> dict:
        with open(os.path.join(self._mdir(table), f"snap-{snap:06d}.json")) as f:
            return json.load(f)

    def _atomic_write(self, path: str, payload: str) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    # -- public API ------------------------------------------------------
    def exists(self, table: str) -> bool:
        return self._head(table) is not None

    def snapshots(self, table: str) -> list[dict]:
        head = self._head(table)
        out: list[dict] = []
        while head is not None:
            m = self._manifest(table, head)
            out.append(m)
            head = m["parent"]
        return list(reversed(out))

    def write(
        self,
        table: str,
        df: DataFrame,
        mode: str = "append",
        meta: dict | None = None,
    ) -> int:
        """Commit df as a new snapshot. mode: 'append' | 'replace'."""
        assert mode in ("append", "replace")
        # stage data under a content-unique dir (no lock held): concurrent
        # writers never collide; the dir only becomes visible via a manifest
        data_dir = os.path.join(self._tdir(table), "data", f"w-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(data_dir)
        return self._commit_staged(table, data_dir, mode, meta)

    def write_with_stats(
        self,
        spark: SparkSession,
        table: str,
        df: DataFrame,
        stats_cols: list[str],
        mode: str = "append",
        meta: dict | None = None,
        files: int = 8,
    ) -> int:
        """Commit df with PER-FILE column min/max stats in the manifest —
        the Iceberg data-skipping contract (manifests carry file-level
        value ranges; the planner prunes files before any footer or row
        is touched). At 100 TB this is the difference between a
        range-predicate scan that opens every file and one that opens
        the few whose range overlaps.

        Layout: ``repartitionByRange(files, *stats_cols)`` so each file
        carries a TIGHT, mostly-disjoint range of the leading stats
        column (random layout would give every file the full value range
        and stats would prune nothing). Stats are collected in ONE
        Spark pass over the staged files (groupBy input_file_name —
        ``files`` rows, a manifest-sized collect) and stored as
        ``file_stats`` in the manifest; :meth:`scan` consults them.
        """
        data_dir = os.path.join(
            self._tdir(table), "data", f"w-{uuid.uuid4().hex}"
        )
        (
            df.repartitionByRange(files, *[F.col(c) for c in stats_cols])
            .write.mode("overwrite")
            .parquet(data_dir)
        )
        staged = spark.read.parquet(data_dir)
        aggs = []
        for c in stats_cols:
            aggs.append(F.min(c).alias(f"mn_{c}"))
            aggs.append(F.max(c).alias(f"mx_{c}"))
        rows = (
            staged.groupBy(F.input_file_name().alias("file"))
            .agg(*aggs)
            .collect()
        )
        file_stats = {
            r["file"]: {c: [r[f"mn_{c}"], r[f"mx_{c}"]] for c in stats_cols}
            for r in rows
        }

        def build(parent: int | None) -> dict:
            if mode == "append" and parent is not None:
                pm = self._manifest(table, parent)
                dirs = pm["data_dirs"] + [data_dir]
                stats = dict(pm.get("file_stats", {}))
            else:
                dirs = [data_dir]
                stats = {}
            stats.update(file_stats)
            return {
                "op": mode,
                "data_dirs": dirs,
                "file_stats": stats,
                "meta": meta or {},
            }

        with self._commit_lock:
            return self._commit_manifest(table, build)

    def scan(
        self,
        spark: SparkSession,
        table: str,
        col: str,
        lo=None,
        hi=None,
        snapshot_id: int | None = None,
    ) -> tuple[DataFrame, dict]:
        """Manifest-stats file pruning scan: read ONLY the files whose
        recorded [min, max] for ``col`` overlaps [lo, hi] (either bound
        may be None = unbounded), then apply the row-level predicate on
        top — stats pruning is a superset filter, so the result is
        EXACTLY the naive filtered read (the gate value-checks that).
        Returns (df, report) where report = {"files_total",
        "files_read"}; files from snapshots committed without stats are
        conservatively always read. A table NONE of whose files carry
        stats degrades to a plain filtered read, never to a wrong one.
        """
        head = snapshot_id if snapshot_id is not None else self._head(table)
        if head is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        m = self._manifest(table, head)
        stats = m.get("file_stats", {})
        all_files = []
        for d in m["data_dirs"]:
            all_files.extend(
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
        # index stats by normalized FULL path (input_file_name records a
        # file: URI): basename-only matching would be O(files x stats)
        # and a basename collision across data dirs could apply another
        # file's range and wrongly prune rows
        def _norm(p: str) -> str:
            for pre in ("file://", "file:"):
                if p.startswith(pre):
                    p = p[len(pre):]
                    break
            return os.path.normpath(p)

        by_path = {_norm(k): v for k, v in stats.items()}
        keep = []
        for f in all_files:
            st = by_path.get(_norm(os.path.abspath(f)), {}).get(col)
            if st is None:
                keep.append(f)  # no stats recorded: must read
                continue
            mn, mx = st
            if mn is None or mx is None:
                keep.append(f)
                continue
            if (lo is not None and mx < lo) or (hi is not None and mn > hi):
                continue  # file's whole range misses the predicate
            keep.append(f)
        report = {"files_total": len(all_files), "files_read": len(keep)}
        if not all_files:
            # a committed snapshot whose data dirs hold no parquet files
            # (e.g. an all-rows-deleted rewrite): spark.read.parquet(*[])
            # raises an opaque "cannot infer schema" — fail with the real
            # cause instead (ADVICE r4)
            raise FileNotFoundError(
                f"table {table} snapshot has no data files under "
                f"{m['data_dirs']}"
            )
        if not keep:
            df = spark.read.parquet(*all_files).limit(0)
        else:
            df = spark.read.parquet(*keep)
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (F.col(col) >= lo)
        if hi is not None:
            pred = pred & (F.col(col) <= hi)
        return df.filter(pred), report

    def _commit_staged(
        self, table: str, data_dir: str, mode: str, meta: dict | None
    ) -> int:
        """Manifest commit for an already-staged data dir (the Spark-free
        half of :meth:`write` — exercised directly by the multi-process
        concurrency test)."""

        def build(parent: int | None) -> dict:
            if mode == "append" and parent is not None:
                pm = self._manifest(table, parent)
                dirs = pm["data_dirs"] + [data_dir]
                # carry forward the parent's per-file stats: the appended
                # dir's files simply have none (scan reads them always),
                # but dropping RECORDED stats would silently disable
                # pruning for the whole table after one plain append
                stats = pm.get("file_stats", {})
            else:
                dirs = [data_dir]
                stats = {}
            out = {"op": mode, "data_dirs": dirs, "meta": meta or {}}
            if stats:
                out["file_stats"] = stats
            return out

        with self._commit_lock:
            return self._commit_manifest(table, build)

    def read(
        self,
        spark: SparkSession,
        table: str,
        snapshot_id: int | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """``merge_schema=True`` is the Iceberg schema-evolution analog:
        appends may widen the schema (new nullable columns) and the read
        unions all per-snapshot parquet schemas, null-filling rows written
        before a column existed. Off by default — schema-stable tables
        skip the extra footer pass."""
        head = snapshot_id if snapshot_id is not None else self._head(table)
        if head is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        dirs = self._manifest(table, head)["data_dirs"]
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*dirs)

    def prune_groups(self, table: str, groups: set[int]) -> bool:
        """Commit a snapshot that excludes every delta written by the given
        groups. Resume hygiene: a crash mid-group can leave staged snapshots
        for a group whose authoritative commit never landed — before
        reprocessing, those orphan deltas are pruned so the re-run cannot
        double-append. Returns True if anything was pruned."""
        return self.prune_if(
            table,
            lambda meta: meta.get("group") is not None
            and int(meta["group"]) in groups,
            reason={"pruned_groups": sorted(groups)},
        )

    def prune_if(self, table: str, drop_fn, reason: dict | None = None) -> bool:
        """Commit a replace snapshot excluding every append delta whose
        manifest meta satisfies ``drop_fn(meta)``. The general staging-sync
        primitive behind :meth:`prune_groups` (incremental waves key deltas
        by (group, wave), not group alone). Returns True if anything was
        pruned; commits nothing otherwise."""
        def build(parent: int | None) -> dict | None:
            if parent is None:
                return None
            keep: list[str] = []
            prev: list[str] = []
            pruned = False
            for m in self.snapshots(table):
                if m["op"] == "replace":
                    keep = []
                    delta = m["data_dirs"]
                else:
                    prev_set = set(prev)
                    delta = [d for d in m["data_dirs"] if d not in prev_set]
                if delta and drop_fn(m["meta"]):
                    pruned = True
                else:
                    keep.extend(delta)
                prev = m["data_dirs"]
            if not pruned:
                return None
            return {
                "op": "replace",
                "data_dirs": keep,
                "meta": reason or {"pruned": True},
            }

        with self._commit_lock:
            return self._commit_manifest(table, build) is not None

    def read_snapshot_delta(
        self, spark: SparkSession, table: str, snapshot_id: int
    ) -> DataFrame:
        """Read ONLY the files added by the given snapshot (its delta vs the
        parent) — the incremental-read primitive a staged pipeline uses to
        consume exactly what it just committed."""
        m = self._manifest(table, snapshot_id)
        parent_dirs = (
            set(self._manifest(table, m["parent"])["data_dirs"])
            if m["parent"] is not None and m["op"] == "append"
            else set()
        )
        own = [d for d in m["data_dirs"] if d not in parent_dirs]
        return spark.read.parquet(*own)

    def compact(self, spark: SparkSession, table: str, target_files: int = 4) -> int:
        """Iceberg-style maintenance: rewrite the table's live rows into one
        right-sized replace snapshot. Incremental appends accumulate
        per-commit file sets; compaction collapses them so downstream scans
        stop paying per-file open cost. Readers are never disturbed — the
        rewrite stages new files and the manifest swap is the same atomic
        rename as any commit (old snapshots remain time-travelable).

        Caveat: the replace snapshot carries no per-group meta, so the
        snapshot-based group recovery can no longer attribute the
        compacted rows — run compaction on COMPLETE tables (the durable
        GroupManifest still proves completion either way)."""
        df = self.read(spark, table)
        return self.write(
            table, df.repartition(target_files), mode="replace",
            meta={"compacted": True},
        )

    def delete_where(
        self, spark: SparkSession, table: str, predicate: str
    ) -> int:
        """Row-level DELETE (retention windows, GDPR forget requests):
        commit a replace snapshot containing every live row NOT matching
        ``predicate`` (a SQL boolean expression over the table's columns).

        Copy-on-write semantics like :meth:`compact`: readers of older
        snapshots still see the deleted rows (time travel is how you
        audit a delete), while the new HEAD excludes them atomically.
        Real Iceberg would prune untouched data files and write positional
        delete files instead of rewriting everything — the commit protocol
        (stage files, atomic manifest swap) is identical, which is what
        the pipeline depends on. Returns the new snapshot id.
        """
        # SQL DELETE semantics: a NULL predicate means NOT MATCHED — the
        # row is kept. A bare NOT(pred) would drop NULL-evaluating rows.
        kept = self.read(spark, table).filter(
            f"NOT coalesce(({predicate}), false)"
        )
        return self.write(
            table, kept, mode="replace", meta={"deleted_where": predicate}
        )

    def update_where(
        self,
        spark: SparkSession,
        table: str,
        set_exprs: dict[str, str],
        predicate: str,
    ) -> int:
        """Row-level UPDATE, copy-on-write: rows matching ``predicate``
        get each column in ``set_exprs`` replaced by its SQL expression
        (evaluated against the old row); all other rows pass through
        byte-identical. Same snapshot/commit semantics as
        :meth:`delete_where`. Returns the new snapshot id."""
        from pyspark.sql import functions as F

        df = self.read(spark, table)
        unknown = set(set_exprs) - set(df.columns)
        if unknown:
            raise ValueError(
                f"update_where: SET names {sorted(unknown)} are not columns "
                f"of {table} ({df.columns})"
            )
        cond = F.expr(predicate)
        updated = df.select(
            *[
                F.when(cond, F.expr(set_exprs[c])).otherwise(F.col(c)).alias(c)
                if c in set_exprs
                else F.col(c)
                for c in df.columns
            ]
        )
        return self.write(
            table,
            updated,
            mode="replace",
            meta={"updated_where": predicate, "set": dict(set_exprs)},
        )

    def merge_into(
        self,
        spark: SparkSession,
        table: str,
        source: DataFrame,
        key_cols: list[str],
        when_matched: str = "update",
    ) -> int:
        """MERGE INTO (upsert), copy-on-write: source rows whose key
        matches a live target row replace it (``when_matched='update'``)
        or remove it (``'delete'``); unmatched source rows insert. The
        Iceberg-contract statement the reference's sink performs per
        point (qdrant upsert, /root/reference/internal/app/storages/
        qdrant/client.go:55-68) — expressed once over the whole
        DataFrame instead of per-row RPCs.

        Scale shape: ONE left_anti shuffle join of target vs the source
        keys (both sides hash-partitioned on the key — at 100 TB AQE
        sizes the exchange, and a selective source benefits from the
        same Bloom pruning operators/bloom.py gives any join), then a
        union with the source and an atomic replace commit. Real Iceberg
        would rewrite only the files containing matches (merge-on-read
        deletion vectors); the commit protocol is identical.
        Returns the new snapshot id.
        """
        if when_matched not in ("update", "delete"):
            raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
        target = self.read(spark, table)
        if set(source.columns) != set(target.columns):
            raise ValueError(
                f"merge_into: source columns {sorted(source.columns)} != "
                f"table columns {sorted(target.columns)}"
            )
        # Iceberg/Delta MERGE raises when several source rows match one
        # target row; a duplicate-keyed source here would silently leave
        # duplicate keys in the table. One map-side-combinable aggregate.
        k = source.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(*[F.col(c) for c in key_cols]).alias("d"),
        ).first()
        if k["n"] != k["d"]:
            raise ValueError(
                f"merge_into: source has duplicate keys on {key_cols} "
                f"({k['n']} rows, {k['d']} distinct keys)"
            )
        keys = source.select(*key_cols).distinct()
        kept = target.join(keys, key_cols, "left_anti")
        merged = (
            kept.unionByName(source) if when_matched == "update" else
            kept.unionByName(source.join(target.select(*key_cols).distinct(),
                                         key_cols, "left_anti"))
        )
        return self.write(
            table,
            merged,
            mode="replace",
            meta={"merged_on": list(key_cols), "when_matched": when_matched},
        )

    def snapshot_cdc(
        self,
        spark: SparkSession,
        table: str,
        from_snapshot: int,
        to_snapshot: int,
        key_cols: list[str],
    ) -> DataFrame:
        """Change-data-capture between two committed snapshots ->
        (_op, *columns) with _op in {insert, delete, update_pre,
        update_post}. The incremental-consumption contract: a downstream
        job that processed ``from_snapshot`` replays exactly this frame
        to catch up to ``to_snapshot`` — the pull-based equivalent of
        the reference's Kafka tail (internal/app/sources/kafka/
        fetch_messages.go:13-84), derived entirely from immutable
        snapshots, so it is replayable and never loses a change.

        Keys present in both snapshots compare by a row fingerprint
        (xxhash64 over every non-key column, NULL-tagged) — changed rows
        emit update_pre (old image) + update_post (new image), matching
        Debezium/Flink changelog conventions.

        Scale shape: one full-outer shuffle join on the key columns;
        fingerprints are computed scan-side so the join carries
        (key, hash) plus row payloads once, and the three change classes
        fall out of NULL-side tests — no driver-side diffing.
        """
        old = self.read(spark, table, snapshot_id=from_snapshot)
        new = self.read(spark, table, snapshot_id=to_snapshot)
        if set(old.columns) != set(new.columns):
            raise ValueError("snapshot_cdc across schema changes is unsupported")
        cols = list(old.columns)
        val_cols = [c for c in cols if c not in key_cols]

        def fp(df: DataFrame) -> DataFrame:
            fingerprint = F.xxhash64(
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                    for c in val_cols
                ]
            )
            return df.withColumn("_fp", fingerprint)

        # explicit presence markers, NOT key-nullness: the full-outer join
        # matches NULL keys via eqNullSafe, so a row whose (first) key
        # column is legitimately NULL would otherwise fail every class
        # filter and silently vanish from the changelog
        o = fp(old).select(
            *[F.col(c).alias(f"o_{c}") for c in cols],
            F.col("_fp").alias("o_fp"),
            F.lit(True).alias("o_present"),
        )
        n = fp(new).select(
            *[F.col(c).alias(f"n_{c}") for c in cols],
            F.col("_fp").alias("n_fp"),
            F.lit(True).alias("n_present"),
        )
        cond = [o[f"o_{k}"].eqNullSafe(n[f"n_{k}"]) for k in key_cols]
        j = o.join(n, cond, "full_outer")
        old_row = [F.col(f"o_{c}").alias(c) for c in cols]
        new_row = [F.col(f"n_{c}").alias(c) for c in cols]
        o_here = F.col("o_present").eqNullSafe(F.lit(True))
        n_here = F.col("n_present").eqNullSafe(F.lit(True))
        inserts = j.filter(~o_here & n_here).select(
            F.lit("insert").alias("_op"), *new_row
        )
        deletes = j.filter(o_here & ~n_here).select(
            F.lit("delete").alias("_op"), *old_row
        )
        changed = j.filter(o_here & n_here & (F.col("o_fp") != F.col("n_fp")))
        pre = changed.select(F.lit("update_pre").alias("_op"), *old_row)
        post = changed.select(F.lit("update_post").alias("_op"), *new_row)
        return inserts.unionByName(deletes).unionByName(pre).unionByName(post)

    def cluster(
        self,
        spark: SparkSession,
        table: str,
        cols: list[str],
        target_files: int = 8,
        zorder: bool = False,
    ) -> int:
        """Iceberg-style data clustering (rewrite-with-sort-order /
        Z-order): rewrite the table so each data file covers a narrow
        value range of ``cols`` — parquet footers then carry tight min/max
        stats and a predicate on a clustering column skips whole files /
        row groups instead of scanning everything.

        ``zorder=False``: range-partition + sort by ``cols`` (best when
        queries filter on a prefix of the column list).
        ``zorder=True`` (exactly 2 numeric columns): interleave the bits
        of the min/max-scaled 16-bit ranks into a Z-value and sort by it —
        BOTH columns get locality, so single-column predicates on either
        one skip files. All arithmetic is JVM bitwise ops (no Python).

        Maintenance op like :meth:`compact` — replace snapshot, atomic
        manifest swap, old snapshots remain time-travelable.
        """
        from pyspark.sql import functions as F

        df = self.read(spark, table)
        if not zorder:
            out = df.repartitionByRange(target_files, *cols).sortWithinPartitions(
                *cols
            )
            meta = {"clustered_by": cols}
        else:
            if len(cols) != 2:
                raise ValueError(
                    f"cluster(zorder=True) expects exactly 2 numeric "
                    f"columns, got {cols!r}"
                )
            cx, cy = cols
            bounds = df.agg(
                F.min(cx).alias("xmin"), F.max(cx).alias("xmax"),
                F.min(cy).alias("ymin"), F.max(cy).alias("ymax"),
            ).collect()[0]  # 1-row maintenance scan, not a data-path collect
            if any(bounds[b] is None for b in ("xmin", "xmax", "ymin", "ymax")):
                raise ValueError(
                    f"cluster(zorder=True) on {table!r}: min/max of "
                    f"{cols!r} undefined (empty table or all-NULL column) "
                    "— nothing to cluster"
                )
            def scaled(c, lo, hi):
                span = float(hi - lo) or 1.0
                return F.least(
                    F.lit(65535),
                    F.floor((F.col(c) - F.lit(lo)) / F.lit(span) * 65535),
                ).cast("long")
            x, y = scaled(cx, bounds["xmin"], bounds["xmax"]), scaled(
                cy, bounds["ymin"], bounds["ymax"]
            )
            z = F.lit(0).cast("long")
            for b in range(16):
                z = (
                    z.bitwiseOR(
                        F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
                    ).bitwiseOR(
                        F.shiftleft(
                            F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1
                        )
                    )
                )
            out = (
                df.withColumn("_z", z)
                .repartitionByRange(target_files, "_z")
                .sortWithinPartitions("_z")
                .drop("_z")
            )
            meta = {"clustered_by": cols, "zorder": True}
        return self.write(table, out, mode="replace", meta=meta)

    def expire_snapshots(self, table: str, keep_last: int = 2) -> int:
        """Iceberg-style retention maintenance: drop every snapshot except
        the most recent ``keep_last``, deleting manifests and any data dir
        no retained snapshot references. The oldest retained manifest is
        re-rooted (parent -> None); because each manifest carries its
        CUMULATIVE data-dir list, retained snapshots stay fully readable
        and time travel inside the retention window is unchanged — travel
        to an expired snapshot now fails, which is the point (the disk
        space is reclaimed). Returns the number of snapshots expired."""
        with self._commit_lock:
            chain = self.snapshots(table)
            if keep_last < 1 or len(chain) <= keep_last:
                return 0
            expired, retained = chain[:-keep_last], chain[-keep_last:]
            live_dirs = {d for m in retained for d in m["data_dirs"]}
            for m in expired:
                for d in m["data_dirs"]:
                    if d not in live_dirs:
                        shutil.rmtree(d, ignore_errors=True)
                os.remove(
                    os.path.join(
                        self._mdir(table), f"snap-{m['snapshot_id']:06d}.json"
                    )
                )
            oldest = dict(retained[0], parent=None)
            self._atomic_write(
                os.path.join(
                    self._mdir(table), f"snap-{oldest['snapshot_id']:06d}.json"
                ),
                json.dumps(oldest, indent=1),
            )
            return len(expired)

    # -- branches: write-audit-publish ---------------------------------
    def _branch_table(self, table: str, branch: str) -> str:
        if not branch or any(c in branch for c in "/\\@") or branch != branch.strip():
            raise ValueError(f"invalid branch name {branch!r}")
        return f"{table}@{branch}"

    def create_branch(self, table: str, branch: str) -> str:
        """Open a WAP (write-audit-publish) branch: an isolated snapshot
        chain seeded zero-copy from the main head (the branch's first
        manifest references the SAME data dirs — no bytes move). Writers
        append to the branch with the normal :meth:`write` on the
        returned branch-table name; main readers never see those commits
        until :meth:`publish_branch`. The Iceberg audit-branch workflow
        (spark.wap.branch) re-expressed on this manifest store.

        Branches are short-lived audit artifacts: don't run
        :meth:`expire_snapshots` on the main table while a branch that
        predates the retained window is still open (the branch's seed
        manifest references main's data dirs)."""
        bt = self._branch_table(table, branch)
        if self.exists(bt):
            raise ValueError(f"branch {branch!r} of {table!r} already exists")
        head = self._head(table)
        dirs = self._manifest(table, head)["data_dirs"] if head is not None else []

        def build(parent: int | None) -> dict:
            return {
                "op": "replace",
                "data_dirs": dirs,
                "meta": {"branch_of": table, "base_snapshot": head},
            }

        with self._commit_lock:
            self._commit_manifest(bt, build)
        return bt

    def _link_tree(self, src: str, dst: str) -> None:
        """Hardlink-copy a staged data dir (fallback to byte copy across
        devices) — publish stays O(#files), not O(bytes)."""
        for dirpath, _dirs, files in os.walk(src):
            rel = os.path.relpath(dirpath, src)
            tgt = dst if rel == "." else os.path.join(dst, rel)
            os.makedirs(tgt, exist_ok=True)
            for fn in files:
                s, d = os.path.join(dirpath, fn), os.path.join(tgt, fn)
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)

    def publish_branch(
        self, table: str, branch: str, require_fast_forward: bool = True
    ) -> int:
        """Publish an audited branch onto main: the branch's DELTA (data
        dirs added since the seed) is hardlinked under the main table and
        committed as one atomic append — after which the branch dir is
        disposable (:meth:`drop_branch`). With ``require_fast_forward``
        (the Iceberg fast-forward contract) the publish refuses if main
        moved since the branch was created, so a concurrent writer's
        commits are never silently interleaved; pass False to append the
        delta onto whatever main head exists now."""
        bt = self._branch_table(table, branch)
        head = self._head(bt)
        if head is None:
            raise FileNotFoundError(f"branch {branch!r} of {table!r} does not exist")
        seed = self._manifest(bt, 1)
        base_dirs = set(seed["data_dirs"])
        base_snap = seed["meta"].get("base_snapshot")
        if require_fast_forward and self._head(table) != base_snap:
            raise ValueError(
                f"main table {table!r} moved since branch {branch!r} was created "
                f"(base {base_snap}, head {self._head(table)}); rebase the audit "
                "or publish with require_fast_forward=False"
            )
        delta = [
            d for d in self._manifest(bt, head)["data_dirs"] if d not in base_dirs
        ]
        linked = []
        for d in delta:
            nd = os.path.join(self._tdir(table), "data", f"wap-{uuid.uuid4().hex}")
            self._link_tree(d, nd)
            linked.append(nd)

        def build(parent: int | None) -> dict:
            # authoritative fast-forward check: build() runs under
            # _commit_lock, so re-verifying here closes the TOCTOU window
            # between the early precondition check above and the commit —
            # a concurrent commit landing in between raises instead of
            # being silently interleaved
            if require_fast_forward and parent != base_snap:
                raise ValueError(
                    f"main table {table!r} moved since branch {branch!r} was "
                    f"created (base {base_snap}, head {parent}); rebase the "
                    "audit or publish with require_fast_forward=False"
                )
            prev = (
                self._manifest(table, parent)["data_dirs"]
                if parent is not None
                else []
            )
            return {
                "op": "append" if parent is not None else "replace",
                "data_dirs": prev + linked,
                "meta": {"wap_published": branch, "base_snapshot": base_snap},
            }

        with self._commit_lock:
            return self._commit_manifest(table, build)

    def drop_branch(self, table: str, branch: str) -> None:
        """Delete a branch's chain and staged data. Safe after publish
        (published files are hardlinks under the main table)."""
        shutil.rmtree(self._tdir(self._branch_table(table, branch)), ignore_errors=True)

    def drop(self, table: str) -> None:
        shutil.rmtree(self._tdir(table), ignore_errors=True)

    # -- schema evolution (field-id mapping, the Iceberg v2/v3 contract) --
    #
    # merge_schema=True on read() already covers append-only widening; the
    # methods below add the parts that need FIELD IDS rather than names:
    # rename (old files' data must surface under the new name) and
    # add-column-with-default (Iceberg v3 initial-default — rows written
    # before the column existed read the default, not NULL). Manifests
    # gain a "schema" key: {"fields": [{id, name, type, default}],
    # "dir_cols": {data_dir: {name_at_write: id}}}. Metadata-only commits
    # (rename/add) ride the same optimistic _commit_manifest loop as data.

    def _schema_of(self, table: str, snap: int | None = None) -> dict:
        head = snap if snap is not None else self._head(table)
        if head is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        m = self._manifest(table, head)
        if "schema" not in m:
            raise ValueError(f"table {table} was not written with write_evolving")
        return m["schema"]

    def write_evolving(
        self, table: str, df: DataFrame, mode: str = "append"
    ) -> int:
        """write() variant that registers field ids: the first commit
        assigns ids 1..n in df column order; later appends must present
        exactly the CURRENT schema names (evolution happens via
        rename_column/add_column, never by sneaking columns into a
        write — the Iceberg writer contract)."""
        assert mode in ("append", "replace")
        data_dir = os.path.join(self._tdir(table), "data", f"w-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(data_dir)
        dtypes = dict(df.dtypes)

        def build(parent: int | None) -> dict:
            if mode == "append" and parent is not None:
                pm = self._manifest(table, parent)
                schema = pm.get("schema")
                if schema is None:
                    raise ValueError(
                        f"table {table} predates write_evolving; replace it"
                    )
                names = [f["name"] for f in schema["fields"]]
                if sorted(df.columns) != sorted(names):
                    raise ValueError(
                        f"append schema {sorted(df.columns)} != table schema "
                        f"{sorted(names)}; use rename_column/add_column to evolve"
                    )
                dirs = pm["data_dirs"] + [data_dir]
                dir_cols = dict(
                    schema["dir_cols"],
                    **{data_dir: {f["name"]: f["id"] for f in schema["fields"]}},
                )
                fields = schema["fields"]
            else:
                fields = [
                    {"id": i + 1, "name": c, "type": dtypes[c], "default": None}
                    for i, c in enumerate(df.columns)
                ]
                dirs = [data_dir]
                dir_cols = {data_dir: {f["name"]: f["id"] for f in fields}}
            return {
                "op": mode,
                "data_dirs": dirs,
                "meta": {},
                "schema": {"fields": fields, "dir_cols": dir_cols},
            }

        with self._commit_lock:
            return self._commit_manifest(table, build)

    def rename_column(self, table: str, old: str, new: str) -> int:
        """Metadata-only commit renaming a field IN PLACE (same id): data
        files are untouched; reads map the old on-disk name to ``new``
        through the id. O(1) regardless of table size — the whole point
        of id-based mapping."""

        def build(parent: int | None) -> dict:
            if parent is None:
                raise FileNotFoundError(f"table {table} has no committed snapshot")
            pm = self._manifest(table, parent)
            schema = self._require_schema(pm, table)
            names = [f["name"] for f in schema["fields"]]
            if old not in names:
                raise ValueError(f"no column {old!r} in {names}")
            if new in names:
                raise ValueError(f"column {new!r} already exists")
            fields = [
                dict(f, name=new) if f["name"] == old else f
                for f in schema["fields"]
            ]
            return {
                "op": "evolve",
                "data_dirs": pm["data_dirs"],
                "meta": {"rename": [old, new]},
                "schema": {"fields": fields, "dir_cols": schema["dir_cols"]},
            }

        with self._commit_lock:
            return self._commit_manifest(table, build)

    def add_column(
        self, table: str, name: str, dtype: str, default=None
    ) -> int:
        """Metadata-only commit adding a field with an Iceberg-v3-style
        initial default: rows in files written BEFORE this commit read
        ``default`` (not NULL); files written after carry real values."""

        def build(parent: int | None) -> dict:
            if parent is None:
                raise FileNotFoundError(f"table {table} has no committed snapshot")
            pm = self._manifest(table, parent)
            schema = self._require_schema(pm, table)
            if name in [f["name"] for f in schema["fields"]]:
                raise ValueError(f"column {name!r} already exists")
            next_id = max(f["id"] for f in schema["fields"]) + 1
            fields = schema["fields"] + [
                {"id": next_id, "name": name, "type": dtype, "default": default}
            ]
            return {
                "op": "evolve",
                "data_dirs": pm["data_dirs"],
                "meta": {"add": name},
                "schema": {"fields": fields, "dir_cols": schema["dir_cols"]},
            }

        with self._commit_lock:
            return self._commit_manifest(table, build)

    @staticmethod
    def _require_schema(manifest: dict, table: str) -> dict:
        schema = manifest.get("schema")
        if schema is None:
            raise ValueError(f"table {table} was not written with write_evolving")
        return schema

    def read_evolved(
        self, spark: SparkSession, table: str, snapshot_id: int | None = None
    ) -> DataFrame:
        """Read through the field-id mapping: per data dir, on-disk names
        rewrite to current names via their ids, columns added after the
        file was written fill with the field's initial default, and the
        union presents one canonical schema. Per-dir plans stay pure
        column projections (rename/withColumn fold into the scan — no
        shuffle, no Python), so evolution costs nothing at read time."""
        head = snapshot_id if snapshot_id is not None else self._head(table)
        if head is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        m = self._manifest(table, head)
        schema = self._require_schema(m, table)
        by_id = {f["id"]: f for f in schema["fields"]}
        parts: list[DataFrame] = []
        for d in m["data_dirs"]:
            df = spark.read.parquet(d)
            cols = []
            id_by_written_name = schema["dir_cols"][d]
            name_by_id = {v: k for k, v in id_by_written_name.items()}
            for f in schema["fields"]:
                written = name_by_id.get(f["id"])
                if written is not None:
                    cols.append(F.col(written).alias(f["name"]))
                else:
                    cols.append(
                        F.lit(f["default"]).cast(f["type"]).alias(f["name"])
                    )
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


class GroupManifest:
    """Resumable-checkpoint manifest (Z3): which input bucket-groups are done.

    Fixes the reference's vestigial offset bookkeeping — it records
    {partition, offset} per message but never commits or reads it back
    (/root/reference/internal/app/sources/kafka/fetch_messages.go:38,75-78;
    the natural commit site, AfterProcessHook, is a no-op at
    /root/reference/internal/app/sources/kafka/process_hooks.go:8-14).
    Here group completion is committed atomically AFTER the group's data
    snapshot, so resume is effectively exactly-once per group.
    """

    def __init__(self, root: str, run_fingerprint: str):
        self.path = os.path.join(root, "_checkpoint", "groups.json")
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        self.fingerprint = run_fingerprint
        self._lock = threading.Lock()

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {"fingerprint": self.fingerprint, "done": []}
        with open(self.path) as f:
            state = json.load(f)
        if state.get("fingerprint") != self.fingerprint:
            # config changed -> previous partial run is not resumable
            return {"fingerprint": self.fingerprint, "done": []}
        return state

    def completed(self) -> set[int]:
        return set(self._load()["done"])

    def mark_done(self, group: int, meta: dict | None = None) -> None:
        with self._lock:
            state = self._load()
            if group not in state["done"]:
                state["done"].append(group)
            state.setdefault("meta", {})[str(group)] = meta or {}
            tmp = f"{self.path}.tmp.{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(state, f, indent=1)
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, self.path)

    def reset(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)


def apply_changelog_agg(
    base_agg: DataFrame,
    changelog: DataFrame,
    key_cols: list[str],
    count_col: str,
    sum_cols: dict[str, str],
) -> DataFrame:
    """Incremental view maintenance: roll a :meth:`Catalog.snapshot_cdc`
    changelog into a maintained grouped aggregate WITHOUT rescanning the
    base table.

    ``base_agg`` is the aggregate state at the changelog's from-snapshot
    (``key_cols`` + ``count_col`` + the keys of ``sum_cols``);
    ``sum_cols`` maps each maintained SUM column in ``base_agg`` to the
    source column it sums over in the changelog rows. Counts and sums
    are self-maintainable aggregates: insert/update_post rows add with
    weight +1, delete/update_pre rows retract with weight -1 — exactly
    the Debezium/Flink retraction-stream algebra. Groups whose
    maintained count reaches zero are dropped (the group no longer
    exists in the table).

    This is the consumer half of the CDC contract (the producer half is
    snapshot_cdc): at 100 TB the base aggregate is never recomputed —
    maintenance cost scales with the CHANGE volume, one map stage over
    the changelog plus one grouped aggregate on the key space and a
    key-space-sized outer join. Deliberate delta vs the reference, which
    re-upserts full entities per wave (internal/adapter/vector_db/
    weaviate/repository.go) and recomputes any derived stats from
    scratch.
    """
    sign = F.when(
        F.col("_op").isin("insert", "update_post"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (
        changelog.withColumn("_sign", sign)
        .groupBy(*key_cols)
        .agg(
            F.sum("_sign").cast("long").alias(f"_d_{count_col}"),
            *[
                F.sum(F.col("_sign") * F.col(src)).cast("long").alias(f"_d_{dst}")
                for dst, src in sum_cols.items()
            ],
        )
    )
    merged = base_agg.join(delta, key_cols, "full_outer")
    agg_cols = [count_col, *sum_cols]
    maintained = [
        (F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"_d_{c}"), F.lit(0)))
        .cast("long")
        .alias(c)
        for c in agg_cols
    ]
    return merged.select(*key_cols, *maintained).filter(F.col(count_col) > 0)
