"""Iceberg-style table layer over partitioned Parquet.

No Iceberg runtime jar ships in this sandbox (SURVEY §7.0), so this thin layer
provides the Iceberg semantics the pipeline needs — atomic snapshot commits,
append/overwrite, time-travel-able snapshot history, and idempotent replace —
behind a `Catalog.read/write/append` API that is a config swap for a real
Iceberg catalog (`df.writeTo(tbl).append()`).

Commit protocol (single-writer, driver-side — SURVEY §7.3.5):
  1. executors write parquet files into  <table>/data/<uuid>/        (staging)
  2. the driver writes a snapshot manifest <table>/_meta/v<N>.json   (file list)
  3. the driver atomically flips          <table>/_meta/_current     (os.replace)
Readers resolve _current -> manifest -> explicit file list, so a crash between
1 and 3 leaves only unreferenced staging files (never a torn table).
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, root: str):
        # realpath at construction: a relative root would otherwise resolve
        # against the Python cwd for manifest/listdir paths but against the
        # JVM's launch cwd for df.write, and those can drift apart mid-
        # session; pinning one absolute spelling removes the whole class of
        # split-brain paths (vacuum additionally realpaths per-file)
        self.root = os.path.realpath(root)
        os.makedirs(self.root, exist_ok=True)

    # -- paths --------------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _meta(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_meta")

    def _current_path(self, table: str) -> str:
        return os.path.join(self._meta(table), "_current")

    # -- snapshot plumbing ----------------------------------------------------
    def _read_current(self, table: str) -> dict | None:
        try:
            with open(self._current_path(table)) as f:
                version = int(f.read().strip())
        except FileNotFoundError:
            return None
        with open(os.path.join(self._meta(table), f"v{version}.json")) as f:
            return json.load(f)

    def _commit(self, table: str, files: list[str], operation: str,
                parent: int | None, added: list[str] | None = None,
                txn: str | None = None,
                partitions: dict[str, dict[str, str]] | None = None) -> int:
        meta = self._meta(table)
        os.makedirs(meta, exist_ok=True)
        version = (parent or 0) + 1
        snap = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "files": sorted(files),
            "added": sorted(added) if added is not None else None,
            "txn": txn,
            "partitions": partitions or {},
            "committed_at": time.time(),
        }
        with open(os.path.join(meta, f"v{version}.json"), "w") as f:
            json.dump(snap, f)
        tmp = self._current_path(table) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._current_path(table))  # the atomic flip
        return version

    # -- public API -----------------------------------------------------------
    def exists(self, table: str) -> bool:
        return self._read_current(table) is not None

    def snapshots(self, table: str) -> list[dict]:
        meta = self._meta(table)
        if not os.path.isdir(meta):
            return []
        out = []
        for fn in sorted(os.listdir(meta)):
            if fn.startswith("v") and fn.endswith(".json"):
                with open(os.path.join(meta, fn)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda s: s["version"])

    def _stage(self, table: str, df: DataFrame,
               partition_by: list[str] | None = None
               ) -> tuple[list[str], dict[str, dict[str, str]]]:
        """Write a staging commit; returns (files, partitions) where
        `partitions` maps file path -> {col: value} parsed from the
        hive-style directory layout. Partition columns are DUPLICATED into
        shadow `_p_<col>` dir keys so the data files keep the original
        column (snapshot reads use explicit file lists, which cannot
        recover dir-encoded values the way a directory scan would)."""
        stage_dir = os.path.join(self._tdir(table), "data", uuid.uuid4().hex)
        if partition_by:
            from pyspark.sql import functions as F  # noqa: PLC0415

            shadowed = df.withColumns(
                {f"_p_{c}": F.col(c).cast("string") for c in partition_by})
            shadowed.write.partitionBy(
                *[f"_p_{c}" for c in partition_by]
            ).mode("overwrite").parquet(stage_dir)
        else:
            df.write.mode("overwrite").parquet(stage_dir)
        files: list[str] = []
        partitions: dict[str, dict[str, str]] = {}
        for root, _dirs, fns in os.walk(stage_dir):
            pvals = {}
            rel = os.path.relpath(root, stage_dir)
            for seg in rel.split(os.sep):
                if "=" in seg and seg.startswith("_p_"):
                    k, v = seg.split("=", 1)
                    # Spark hive-escapes dir values (':' -> '%3A' etc.);
                    # record the UNESCAPED value or predicates with any
                    # escaped character would silently prune matching files.
                    # Null/empty values keep Spark's
                    # __HIVE_DEFAULT_PARTITION__ sentinel.
                    pvals[k[3:]] = urllib.parse.unquote(v)
            for fn in fns:
                if fn.endswith(".parquet"):
                    p = os.path.join(root, fn)
                    files.append(p)
                    if pvals:
                        partitions[p] = pvals
        return files, partitions

    def overwrite(self, table: str, df: DataFrame,
                  partition_by: list[str] | None = None) -> int:
        files, parts = self._stage(table, df, partition_by)
        cur = self._read_current(table)
        return self._commit(table, files, "overwrite",
                            cur["version"] if cur else None,
                            partitions=parts)

    def append(self, table: str, df: DataFrame, txn: str | None = None,
               partition_by: list[str] | None = None) -> int:
        """Append with an optional transaction tag. A multi-table writer tags
        every table's append with one txn id and commits a marker table last;
        `remove_orphan_appends` can then roll back appends whose txn never
        reached the marker — pure metadata surgery, no data rewrite."""
        files, parts = self._stage(table, df, partition_by)
        cur = self._read_current(table)
        base = cur["files"] if cur else []
        base_parts = dict(cur.get("partitions") or {}) if cur else {}
        base_parts.update(parts)
        return self._commit(table, base + files, "append",
                            cur["version"] if cur else None,
                            added=files, txn=txn, partitions=base_parts)

    def txns(self, table: str) -> set[str]:
        """Transaction tags of all snapshots ever committed to `table`."""
        return {s["txn"] for s in self.snapshots(table) if s.get("txn")}

    def remove_orphan_appends(self, table: str, live_txns: set[str]) -> int:
        """Drop the files added by tagged appends whose txn is not in
        `live_txns` (i.e. the crash happened before the txn's marker commit).
        Untagged snapshots are always kept. Returns the number of files
        removed; commits one 'rollback' snapshot iff anything was removed."""
        cur = self._read_current(table)
        if cur is None:
            return 0
        dead: set[str] = set()
        for s in self.snapshots(table):
            if (s["operation"] == "append" and s.get("txn")
                    and s["txn"] not in live_txns and s.get("added")):
                dead.update(s["added"])
        keep = [f for f in cur["files"] if f not in dead]
        n_removed = len(cur["files"]) - len(keep)
        if n_removed:
            keep_parts = {f: p for f, p in (cur.get("partitions") or {}).items()
                          if f not in dead}
            self._commit(table, keep, "rollback", cur["version"],
                         partitions=keep_parts)
        return n_removed

    def vacuum(self, table: str, keep_versions: int = 1) -> int:
        """Delete data files not referenced by the newest `keep_versions`
        snapshots (Iceberg's expire-snapshots + orphan-file GC analogue —
        reclaims the files left behind by `remove_orphan_appends` rollbacks
        and by overwrites). Metadata for expired snapshots is kept (cheap,
        and preserves the audit trail); only their exclusive data files go.
        Returns the number of files deleted."""
        snaps = self.snapshots(table)
        if not snaps:
            return 0
        cur = self._read_current(table)
        # never GC files visible from _current, nor from the newest N snaps.
        # Liveness is compared on REALPATHS: the catalog may be opened with a
        # different spelling of the same root (relative vs absolute vs
        # symlinked) than the one that wrote the manifests, and a naive
        # string comparison would then see every live file as dead.
        keep: set[str] = set()
        for s in ([cur] if cur else []) + snaps[-keep_versions:]:
            keep.update(os.path.realpath(f) for f in s["files"])
        data_root = os.path.join(self._tdir(table), "data")
        if not os.path.isdir(data_root):
            return 0
        n = 0
        for stage in os.listdir(data_root):
            sdir = os.path.join(data_root, stage)
            if not os.path.isdir(sdir):
                continue
            # walk RECURSIVELY: partitioned staging commits nest their data
            # files under hive-style key=value dirs — a flat listdir would
            # see zero parquet files and rmtree a live commit
            parquets = [os.path.join(root, f)
                        for root, _dirs, fs in os.walk(sdir)
                        for f in fs if f.endswith(".parquet")]
            live = [p for p in parquets if os.path.realpath(p) in keep]
            if not live:
                # whole staging commit expired: drop it with its markers
                import shutil  # noqa: PLC0415

                n += len(parquets)
                shutil.rmtree(sdir)
            else:
                # `live` is non-empty here, so at least one parquet always
                # stays and the _SUCCESS marker stays meaningful; the
                # zero-files-left case is the rmtree branch above
                for p in parquets:
                    if os.path.realpath(p) not in keep:
                        os.remove(p)
                        # Hadoop checksum sidecar (.<name>.crc) would
                        # otherwise accumulate as an orphan
                        crc = os.path.join(os.path.dirname(p),
                                           f".{os.path.basename(p)}.crc")
                        if os.path.exists(crc):
                            os.remove(crc)
                        n += 1
                # drop hive partition dirs emptied by the removals
                # (bottom-up; never the stage root itself)
                for root, _dirs, _fns in os.walk(sdir, topdown=False):
                    if root != sdir and not os.listdir(root):
                        os.rmdir(root)  # live check: walk caches listings
        return n

    def _snap(self, table: str, version: int | None) -> dict:
        if version is None:
            snap = self._read_current(table)
        else:
            with open(os.path.join(self._meta(table), f"v{version}.json")) as f:
                snap = json.load(f)
        if snap is None:
            raise FileNotFoundError(f"table not found: {table}")
        return snap

    def scan_files(self, table: str, *, where: dict | None = None,
                   version: int | None = None) -> list[str]:
        """Snapshot file list after MANIFEST-LEVEL partition pruning — the
        Iceberg move: a reader with a partition predicate never opens
        non-matching files. Files without recorded partition values for a
        predicate column are conservatively kept (pruning is an
        optimization; `read` applies the residual row filter). Predicate
        values are compared as strings (manifest values always are — the
        keyword-only signature also keeps `version` and `where` from being
        swapped positionally)."""
        snap = self._snap(table, version)
        files = snap["files"]
        if not where:
            return files
        parts = snap.get("partitions") or {}
        want = {k: str(v) for k, v in where.items()}
        return [
            f for f in files
            if all(parts.get(f, {}).get(k, v) == v for k, v in want.items())
        ]

    def read(self, spark: SparkSession, table: str,
             version: int | None = None,
             where: dict[str, str] | None = None) -> DataFrame:
        """Read a snapshot; `where={col: value}` prunes at the manifest
        level (only matching partitions' files are opened) and applies the
        residual row filter for exactness."""
        files = self.scan_files(table, where=where, version=version)
        all_files = self._snap(table, version)["files"]
        if not all_files:
            raise ValueError(f"empty table: {table}")
        if not files:
            # a predicate matching zero partitions is a normal query
            # outcome: empty result with the table's schema, same as when
            # the residual filter drops every row
            return spark.read.parquet(*all_files).limit(0)
        df = spark.read.parquet(*files)
        for k, v in (where or {}).items():
            df = df.filter(df[k].cast("string") == str(v))
        return df
