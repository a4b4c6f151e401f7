"""Iceberg-style table layer over partitioned Parquet.

No Iceberg runtime jar ships in this sandbox (SURVEY §7.0), so this thin layer
provides the Iceberg semantics the pipeline needs — atomic snapshot commits,
append/overwrite, time-travel-able snapshot history, and idempotent replace —
behind a `Catalog.read/write/append` API that is a config swap for a real
Iceberg catalog (`df.writeTo(tbl).append()`).

Metadata layout (Iceberg manifest-list shape — round 4; the round-3 layout
rewrote the FULL cumulative file list into every snapshot, O(files) metadata
per append and O(files^2) over a table's life, which at the 10^12-row north
star is the first driver bottleneck):

  <table>/_meta/m-<uuid>.json   MANIFEST: the files ADDED by one commit
                                (path + partition values + txn per file)
  <table>/_meta/v<N>.json       SNAPSHOT: a manifest LIST — one small entry
                                per live manifest (path, n_files, txn set,
                                per-column partition-value summary).
                                Creating this file (atomic os.link,
                                fail-if-exists) IS the commit point.
  <table>/_meta/_current        advisory version HINT (atomic os.replace);
                                readers probe forward from it

An append therefore writes O(new files) manifest bytes plus an O(#manifests)
snapshot, and #manifests is kept bounded by merging small manifests on
commit (Iceberg's commit.manifest.min-count-to-merge analogue), so metadata
bytes per append stay flat no matter how many commits the table has seen.
Readers prune at the manifest-list level first — a partition predicate that
rules out a manifest's value summary never opens that manifest at all.

Commit protocol (optimistic multi-writer, driver-side — SURVEY §7.3.5; the
same shape as Iceberg's HadoopTableOperations):
  1. executors write parquet files into  <table>/data/<uuid>/        (staging)
  2. the driver writes the manifest and a snapshot tempfile under _meta/
  3. the driver atomically LINKS the snapshot into place as v<N>.json
     (os.link, fail-if-exists) — THE commit point; EEXIST means another
     writer committed version N first (rebase and retry)
  4. the driver advances the _current hint (os.replace) — advisory only
Readers resolve _current, probe FORWARD for newer committed v<N+k>.json
files (a writer may have crashed between 3 and 4, or a racing hint write
may have regressed the pointer), then snapshot -> manifests -> file list.
A crash anywhere before step 3 leaves only unreferenced staging/metadata
files (never a torn table); a crash after step 3 leaves a fully durable
commit that the forward probe surfaces. There is no claimed-but-uncommitted
window at all, so no commit can wedge the table and no manual repair step
exists.

Partition predicates (`where=` on read/scan_files) accept:
  {"lang": "en"}                          equality
  {"lang": ("in", ["en", "hi"])}          membership
  {"day": (">=", "2025-01-01")}           range (also <=, >, <)
  {"day": ("between", "2025-01-01", "2025-02-01")}   inclusive range
Values compare as Spark STRING casts (manifest values always are): range
predicates are lexicographic, which is correct for zero-padded dates and
fixed-width keys — the pipeline's partition columns. Python bool/int/None
predicate values are normalized to Spark's cast-to-string form ('true', not
'True'); floats raise (Java's Double.toString disagrees with Python repr —
pass the string you partitioned with).

Column statistics (`stats_where=` on read/scan_files — round 6): every
commit records footer-derived min/max/null-count per primitive column in
its manifest rows (Iceberg's write.metadata.metrics), merged into a
per-manifest stats summary. The same predicate grammar then skips
manifests and files on ANY stats-collected column — typed comparison
(ints numerically, timestamps as instants), independent of the partition
layout. This is the data-skipping tier under partition pruning: a
`warc_ts >= X` or `doc_id between A and B` scan over a 10^12-row table
opens only the files whose bounds overlap, and the typed residual row
filter keeps results exact.
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession

# Spark writes null AND empty-string partition values to this hive dir name.
# The DIRECTORY encoding is lossy, but the residual row filter is not: the
# sentinel only governs which files are OPENED; equality-with-None then
# matches exactly the null rows and equality-with-'' exactly the '' rows.
HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# manifest merge policy: when at least MERGE_MIN manifests smaller than
# SMALL_MANIFEST files have accumulated, one commit folds them into a single
# manifest. Each merge multiplies a file's manifest size ~MERGE_MIN-fold, so
# a file is rewritten O(log(SMALL_MANIFEST)/log(MERGE_MIN)) ~= 1-2 times in
# its life — amortized O(1) metadata work per file.
MERGE_MIN = 16
SMALL_MANIFEST = 64
# value summaries larger than this collapse to {min,max} bounds
SUMMARY_MAX_VALUES = 16
# per-file column-stats policy (Iceberg's write.metadata.metrics analogue):
# footer-derived min/max/null-count for the first STATS_MAX_COLUMNS
# primitive top-level columns; string bounds truncate to STATS_STR_BOUND
# chars (lower = prefix, upper = prefix with last char incremented — both
# remain VALID bounds, so skipping stays sound on arbitrarily long urls).
# Commits staging more than STATS_DISTRIBUTE_MIN files collect footers in a
# distributed Spark job instead of a driver loop — at cluster scale a large
# compaction's metadata pass must not serialize through the driver.
STATS_MAX_COLUMNS = 32
STATS_STR_BOUND = 64
STATS_DISTRIBUTE_MIN = 64
# optimistic-concurrency rebase attempts before giving up. A retry is only
# consumed when ANOTHER writer's commit landed, so N retries tolerate N
# concurrent committers — not N time slices.
COMMIT_RETRIES = 16
# vacuum's safety gate for deleting UNREFERENCED metadata/staging files:
# anything younger than this may belong to an in-flight commit (staged data
# and manifests are written BEFORE the atomic snapshot link), so only files
# past the gate are reclaimable orphans. Matches the spirit of Iceberg's
# remove-orphan-files "older-than" requirement.
VACUUM_MIN_AGE_SECS = 600.0


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this snapshot version first (the atomic
    v<N>.json link is the commit point, so an existing version file is
    always a COMPLETED commit, never a stale lock). Writers that can
    rebase (append/rollback/compact — their staged files are still valid
    against a newer parent) retry automatically."""


def _pvalue(v) -> str:
    """Normalize a Python predicate value to Spark's cast-to-string form.

    bool must map to 'true'/'false' (Python str() gives 'True' — a silent
    empty result); None maps to the hive null sentinel; floats raise because
    Java Double.toString ('1.0E21') disagrees with Python repr ('1e+21')."""
    if v is None:
        return HIVE_NULL
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        raise TypeError(
            "float partition predicate values are ambiguous (Python repr != "
            "Spark's string cast); pass the string the column casts to")
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return v
    raise TypeError(f"unsupported partition predicate value: {v!r}")


_RANGE_OPS = {">=", "<=", ">", "<"}


def _normalize_pred(spec) -> tuple:
    """Parse one `where` entry into a normalized predicate tuple."""
    if isinstance(spec, (tuple, list)):
        op = spec[0]
        if op == "in":
            return ("in", sorted({_pvalue(x) for x in spec[1]}))
        if op in ("=", "=="):
            return ("=", _pvalue(spec[1]))
        if op in _RANGE_OPS:
            return (op, _pvalue(spec[1]))
        if op == "between":
            return ("between", _pvalue(spec[1]), _pvalue(spec[2]))
        raise ValueError(f"unknown partition predicate op: {op!r}")
    return ("=", _pvalue(spec))


def _match_value(pred: tuple, v: str | None) -> bool:
    """Does one file's recorded partition value satisfy the predicate?
    Unknown values (file written without partition_by) conservatively
    match — pruning is an optimization, the residual filter is exact.
    The hive sentinel dir holds BOTH null and empty-string rows, so a
    sentinel file must be kept whenever '' could satisfy the predicate
    (review finding: pruning it while the residual `c == ''` / `c >= ''`
    would match is a silent row loss)."""
    if v is None:
        return True
    op = pred[0]
    if op == "=":
        return v == pred[1] or (v == HIVE_NULL and pred[1] == "")
    if op == "in":
        return v in pred[1] or (v == HIVE_NULL and "" in pred[1])
    if v == HIVE_NULL:
        v = ""  # the sentinel may hide '' rows; nulls themselves never
        # satisfy a range (null string casts compare to null -> filtered)
    if op == ">=":
        return v >= pred[1]
    if op == "<=":
        return v <= pred[1]
    if op == ">":
        return v > pred[1]
    if op == "<":
        return v < pred[1]
    return pred[1] <= v <= pred[2]  # between


def _match_summary(pred: tuple, summ: dict | None) -> bool:
    """Can ANY file in a manifest satisfy the predicate, judged from the
    manifest-list value summary alone? None (column not recorded for every
    file) conservatively keeps the manifest."""
    if summ is None:
        return True
    if "values" in summ:
        return any(_match_value(pred, v) for v in summ["values"])
    # bounds summary: {min, max} over non-null values, "null": True if any
    has_null = summ.get("null", False)
    lo, hi = summ.get("min"), summ.get("max")
    op = pred[0]
    if op == "=":
        if pred[1] in (HIVE_NULL, ""):
            return has_null
        return lo is not None and lo <= pred[1] <= hi
    if op == "in":
        return any(_match_summary(("=", v), summ) for v in pred[1])
    if has_null and _match_value(pred, HIVE_NULL):
        return True  # sentinel files may hide '' rows the range matches
    if lo is None:  # otherwise an all-null manifest never overlaps a range
        return False
    if op == ">=":
        return hi >= pred[1]
    if op == "<=":
        return lo <= pred[1]
    if op == ">":
        return hi > pred[1]
    if op == "<":
        return lo < pred[1]
    return hi >= pred[1] and lo <= pred[2]  # between


def _build_summary(rows: list[dict]) -> dict[str, dict]:
    """Per-column partition-value summary for a manifest entry. A column is
    summarized only when EVERY file in the manifest records it — otherwise
    the column is omitted and predicates on it keep the manifest."""
    if not rows:
        return {}
    cols = set(rows[0].get("partition") or {})
    for r in rows[1:]:
        cols &= set(r.get("partition") or {})
    out: dict[str, dict] = {}
    for c in sorted(cols):
        vals = sorted({r["partition"][c] for r in rows})
        if len(vals) <= SUMMARY_MAX_VALUES:
            out[c] = {"values": vals}
        else:
            non_null = [v for v in vals if v != HIVE_NULL]
            out[c] = {"null": len(non_null) < len(vals)}
            if non_null:
                out[c]["min"] = non_null[0]
                out[c]["max"] = non_null[-1]
    return out


# -- per-file column statistics (data skipping beyond partition pruning) ----
#
# File stats shape (JSON, per manifest row under "stats"):
#   {col: {"nulls": int, "min": v, "max": v | null}}
# "min" present iff the file has non-null values with encodable bounds; a
# stats entry WITHOUT "min" is an all-null file for that column. "max" of
# JSON null means "unbounded above" (a truncated string whose upper bound
# could not be incremented). Columns with unencodable stats (binary, NaN
# floats, unsupported types) are simply absent — absence always means
# "cannot prune", never "no rows".


class _UnsupportedStats(Exception):
    """Raised by _stats_value for types the stats layer cannot soundly
    bound (binary, NaN, exotic objects) — the column is then skipped."""


def _stats_value(v):
    """Encode a bound or predicate value into the JSON-safe, totally
    ordered form stats comparisons run on. Timestamps normalize to naive
    UTC isoformat — fixed-width date/time prefixes make the string order
    equal the instant order, and normalizing tz-awareness keeps footer
    values (often tz-aware UTC) comparable with naive predicate values."""
    import datetime as _dt  # noqa: PLC0415

    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        import math as _math  # noqa: PLC0415

        if _math.isnan(v):
            raise _UnsupportedStats("NaN bound")
        return v
    if isinstance(v, str):
        return v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep="T")
    if isinstance(v, _dt.date):
        return v.isoformat()
    raise _UnsupportedStats(f"unsupported stats type: {type(v).__name__}")


def _upper_bound_str(s: str) -> str | None:
    """Truncate-and-increment: a string <= STATS_STR_BOUND chars that is
    >= every string prefixed by it, or None when no such bound exists
    (all prefix chars already at the max code point)."""
    if len(s) <= STATS_STR_BOUND:
        return s
    prefix = s[:STATS_STR_BOUND]
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < 0x10FFFF:
            return prefix[:i] + chr(cp + 1)
    return None


def _file_stats(path: str, columns: list[str] | None) -> dict:
    """Footer-only per-file column stats: min/max/null-count per primitive
    top-level column, merged across row groups. Never reads data pages.
    Module-level (not a method) so the distributed collection path can
    ship it to executors without closing over the Catalog."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    md = pq.ParquetFile(path).metadata
    fields = [md.schema.column(i).path for i in range(md.num_columns)]
    want = [f for f in fields if "." not in f
            and (columns is None or f in columns)][:STATS_MAX_COLUMNS]
    idx = {f: fields.index(f) for f in want}
    out: dict[str, dict] = {}
    for col in want:
        nulls = 0
        nulls_known = True
        lo = hi = None
        have_rows = False
        usable = True
        for rg in range(md.num_row_groups):
            c = md.row_group(rg).column(idx[col])
            st = c.statistics
            if st is None:
                usable = False
                break
            if st.has_null_count:
                nulls += st.null_count
            else:
                nulls_known = False
            non_null = (c.num_values - st.null_count
                        if st.has_null_count else None)
            if non_null == 0:
                continue  # all-null row group: no bounds to merge
            if not st.has_min_max:
                usable = False  # non-null values but no bounds: can't
                break           # soundly skip this file on this column
            try:
                mn, mx = _stats_value(st.min), _stats_value(st.max)
            except _UnsupportedStats:
                usable = False
                break
            have_rows = True
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        if not usable:
            continue
        ent: dict = {}
        if nulls_known:
            ent["nulls"] = nulls
        if have_rows:
            ent["min"] = lo[:STATS_STR_BOUND] if isinstance(lo, str) else lo
            ent["max"] = _upper_bound_str(hi) if isinstance(hi, str) else hi
        elif not nulls_known:
            continue  # nothing known at all: recording {} would read as
            # "all-null", which is a SKIPPING decision — omit instead
        out[col] = ent
    return out


def _build_stats_summary(rows: list[dict]) -> dict[str, dict]:
    """Manifest-level merge of per-file stats: a column is summarized only
    when EVERY file records it (else one stats-less file could hide rows
    the summary would prune). Shape: {col: {"null": bool, "min"?, "max"?}}
    — "max" of None again means unbounded above."""
    if not rows or any("stats" not in r or r["stats"] is None for r in rows):
        return {}
    cols = set(rows[0]["stats"])
    for r in rows[1:]:
        cols &= set(r["stats"])
    out: dict[str, dict] = {}
    for c in sorted(cols):
        ents = [r["stats"][c] for r in rows]
        has_null = any("nulls" not in e or e["nulls"] > 0 for e in ents)
        bounded = [e for e in ents if "min" in e]
        ent: dict = {"null": has_null}
        if bounded:
            try:
                ent["min"] = min(e["min"] for e in bounded)
                maxes = [e["max"] for e in bounded]
                ent["max"] = None if any(m is None for m in maxes) \
                    else max(maxes)
            except TypeError:
                continue  # cross-file bound types disagree: a summary
                # could mis-prune, so record nothing for the column
        out[c] = ent
    return out


def _normalize_stats_pred(spec) -> tuple:
    """Typed predicate for stats skipping: same op grammar as partition
    `where`, but values stay TYPED (ints compare numerically, not as hive
    strings) — encoded via _stats_value for bound comparisons while the
    residual row filter uses the original value. None is only meaningful
    under '=' / 'in' (IS NULL); ranges over None are rejected."""
    def enc(v):
        if v is None:
            return None
        try:
            return _stats_value(v)
        except _UnsupportedStats as e:
            raise TypeError(f"unsupported stats predicate value: {e}") \
                from None

    if isinstance(spec, (tuple, list)):
        op = spec[0]
        if op == "in":
            return ("in", [(enc(x), x) for x in spec[1]])
        if op in ("=", "=="):
            return ("=", enc(spec[1]), spec[1])
        if op in _RANGE_OPS or op == "between":
            vals = spec[1:]
            if any(v is None for v in vals):
                raise ValueError(f"stats predicate {op!r} over None")
            if op == "between":
                return ("between", enc(spec[1]), enc(spec[2]),
                        spec[1], spec[2])
            return (op, enc(spec[1]), spec[1])
        raise ValueError(f"unknown stats predicate op: {op!r}")
    return ("=", enc(spec), spec)


def _stats_incomparable(col: str, e: TypeError):
    return ValueError(
        f"stats predicate on {col!r} does not compare with the recorded "
        f"bounds (type mismatch: {e}); pass the column's own type")


def _match_stats(col: str, pred: tuple, st: dict | None) -> bool:
    """Can a file (or manifest) with the recorded stats contain a row
    satisfying the predicate? Missing stats conservatively match. Works on
    both shapes: file stats carry "nulls" (int, absent = unknown) and
    summaries carry "null" (bool)."""
    if st is None:
        return True
    has_null = st["null"] if "null" in st \
        else ("nulls" not in st or st["nulls"] > 0)
    has_rows = "min" in st
    lo, hi = st.get("min"), st.get("max")
    op = pred[0]
    try:
        if op == "=":
            if pred[1] is None:
                return has_null
            return has_rows and lo <= pred[1] \
                and (hi is None or pred[1] <= hi)
        if op == "in":
            return any(_match_stats(col, ("=", ev, v), st)
                       for ev, v in pred[1])
        if not has_rows:
            return False  # null rows never satisfy a range predicate
        if op == ">=":
            return hi is None or hi >= pred[1]
        if op == ">":
            return hi is None or hi > pred[1]
        if op == "<=":
            return lo <= pred[1]
        if op == "<":
            return lo < pred[1]
        return (hi is None or hi >= pred[1]) and lo <= pred[2]  # between
    except TypeError as e:
        raise _stats_incomparable(col, e) from None


class Catalog:
    def __init__(self, root: str):
        # realpath at construction: a relative root would otherwise resolve
        # against the Python cwd for manifest/listdir paths but against the
        # JVM's launch cwd for df.write, and those can drift apart mid-
        # session; pinning one absolute spelling removes the whole class of
        # split-brain paths (vacuum additionally realpaths per-file)
        self.root = os.path.realpath(root)
        os.makedirs(self.root, exist_ok=True)
        # stats of the most recent scan_files call, for plan assertions:
        # {"manifests_total", "manifests_opened", "files_selected"}
        self.last_scan_stats: dict[str, int] = {}
        # stats of the most recent txns() call, for the O(1)-replay-check
        # assertion (tests/test_tables_resume.py): {"meta_files_opened"}
        self.last_txn_stats: dict[str, int] = {}

    # -- paths --------------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _meta(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_meta")

    def _current_path(self, table: str) -> str:
        return os.path.join(self._meta(table), "_current")

    # -- manifest plumbing --------------------------------------------------
    def _write_manifest(self, table: str, rows: list[dict],
                        txns: list[str | None],
                        op: str = "append") -> dict:
        """Write one manifest file and return its manifest-LIST entry.
        `rows` = [{"path": ..., "partition": {col: str} | None,
                   "txn": str | None}]. `op` records the originating
        operation so rollback surgery can distinguish append commits
        (rollback candidates) from overwrite commits (replace semantics —
        e.g. an ANN index rebuild — never rolled back by txn absence)."""
        meta = self._meta(table)
        os.makedirs(meta, exist_ok=True)
        path = os.path.join(meta, f"m-{uuid.uuid4().hex}.json")
        with open(path, "w") as f:
            json.dump({"files": rows}, f)
        return {
            "manifest": path,
            "n_files": len(rows),
            "txns": sorted({t for t in txns if t}),
            "op": op,
            "summary": _build_summary(rows),
            "stats_summary": _build_stats_summary(rows),
        }

    def _read_manifest(self, entry: dict) -> list[dict]:
        if "rows" in entry:  # in-memory entry upgraded from an old-layout
            return entry["rows"]  # snapshot (see _upgrade_snap)
        with open(entry["manifest"]) as f:
            return json.load(f)["files"]

    def _maybe_merge(self, table: str, entries: list[dict]) -> list[dict]:
        """Fold accumulated small manifests into one (Iceberg's
        commit.manifest.min-count-to-merge) so the manifest list — and with
        it the snapshot json — stays bounded across unbounded appends."""
        # only append-originated manifests merge: folding an overwrite
        # entry in would erase the op provenance rollback surgery keys on
        # (legacy entries without "op" are appends — overwrite tagging and
        # op recording shipped together)
        small = [e for e in entries if e["n_files"] < SMALL_MANIFEST
                 and e.get("op", "append") == "append"]
        if len(small) < MERGE_MIN:
            return entries
        rows: list[dict] = []
        for e in small:
            rows.extend(self._read_manifest(e))
        merged = self._write_manifest(
            table, rows, [t for e in small for t in e.get("txns", [])])
        small_ids = {id(e) for e in small}
        return [e for e in entries if id(e) not in small_ids] + [merged]

    # -- snapshot plumbing --------------------------------------------------
    def _listdir_version(self, table: str) -> int:
        """Newest version derivable from a _meta directory listing — the
        recovery path when the hint is missing, corrupt, or stale past a
        vacuum expiry gap (any existing v<N>.json is a completed commit,
        so the max is always the current version)."""
        meta = self._meta(table)
        if not os.path.isdir(meta):
            return 0
        return max(
            (int(fn[1:-5]) for fn in os.listdir(meta)
             if fn.startswith("v") and fn.endswith(".json")
             and fn[1:-5].isdigit()), default=0)

    def _current_version(self, table: str) -> int:
        """Newest COMMITTED version (0 = table absent). The _current hint is
        advisory: a writer may have crashed between its atomic snapshot link
        (the commit point) and the hint write, or a slow racing hint write
        may have regressed the pointer — so readers probe FORWARD from the
        hint for newer v<N>.json files. The hint is rewritten on every
        commit, so the probe is one stat call in the steady state."""
        meta = self._meta(table)
        try:
            with open(self._current_path(table)) as f:
                version = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            version = self._listdir_version(table)
        while os.path.exists(os.path.join(meta, f"v{version + 1}.json")):
            version += 1
        return version

    def _read_current(self, table: str) -> dict | None:
        version = self._current_version(table)
        if version == 0:
            return None
        try:
            with open(os.path.join(self._meta(table),
                                   f"v{version}.json")) as f:
                return self._upgrade_snap(json.load(f))
        except FileNotFoundError:
            # the hint can be stale across a vacuum EXPIRY GAP (review
            # finding): hint says 5, v6/v7 were committed by writers that
            # crashed before their hint writes, vacuum expired v5/v6 —
            # the forward probe from 5 stops at the gap. Any existing
            # v<N>.json is a completed commit, so the listing's max is
            # authoritative; heal the hint so later reads are O(1) again.
            version = self._listdir_version(table)
            if version == 0:
                return None
            with open(os.path.join(self._meta(table),
                                   f"v{version}.json")) as f:
                snap = self._upgrade_snap(json.load(f))
            self._write_hint(table, version)
            return snap

    def _commit(self, table: str, manifests: list[dict], operation: str,
                parent: int | None, txn: str | None = None,
                schema: str | None = None,
                all_txns: set[str] | None = None) -> int:
        meta = self._meta(table)
        os.makedirs(meta, exist_ok=True)
        version = (parent or 0) + 1
        snap = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "manifests": manifests,
            "txn": txn,
            "schema": schema,
            # Iceberg-like cumulative txn summary: the CURRENT snapshot knows
            # every txn tag ever committed, so the exactly-once replay check
            # (txns()) is O(1) metadata file opens instead of walking every
            # historical version json — which streaming calls per micro-batch
            "all_txns": sorted((all_txns or set()) | ({txn} if txn else set())),
            "committed_at": time.time(),
        }
        # optimistic concurrency (Iceberg's HadoopTableOperations shape):
        # the atomic link(tmp, vN) IS the commit point — the fully-written
        # snapshot appears in one step, and a second writer racing for the
        # same version gets EEXIST instead of silently overwriting (an
        # open("w") last-write-wins would LOSE one of two concurrent
        # commits — e.g. a streaming append racing a compact job). Because
        # the link is the LAST step that matters, a crash at any point
        # leaves either nothing visible or a fully durable commit — there
        # is no claimed-but-uncommitted state to repair.
        vpath = os.path.join(meta, f"v{version}.json")
        tmp_v = vpath + f".tmp.{uuid.uuid4().hex}"
        with open(tmp_v, "w") as f:
            json.dump(snap, f)
        try:
            os.link(tmp_v, vpath)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"version {version} of table {table!r} was committed by a "
                "concurrent writer") from None
        finally:
            os.remove(tmp_v)
        # advance the advisory hint. Best-effort and non-monotonic under
        # races (a descheduled writer can replace it with an older number);
        # readers probe forward from whatever it says, so a stale or
        # regressed hint costs stat calls, never correctness.
        self._write_hint(table, version)
        return version

    def _write_hint(self, table: str, version: int) -> None:
        tmp = self._current_path(table) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._current_path(table))

    def _commit_rebased(self, table: str, build) -> int:
        """Retry loop for rebasable commits: `build(cur)` returns the
        _commit kwargs computed against the snapshot read for THIS
        attempt; on a version conflict (EEXIST on the commit link — the
        conflicting version file is by construction a COMPLETED commit)
        the next iteration's `_read_current` probes forward to the
        winner's snapshot and the commit is rebased against it. The
        staged data files are parent-independent, so only metadata is
        recomputed. A retry is consumed only when another commit actually
        landed."""
        for _ in range(COMMIT_RETRIES):
            cur = self._read_current(table)
            try:
                return self._commit(table, **build(cur))
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"gave up committing to {table!r} after {COMMIT_RETRIES} "
            "rebases (heavy concurrent write load)")

    @staticmethod
    def _upgrade_snap(snap: dict) -> dict:
        """Read-compat for pre-manifest-list snapshots (round-3 layout:
        full "files" list + per-file "partitions" dict in the snapshot).
        Upgraded IN MEMORY to one synthetic manifest entry with inline
        rows; the next append/rollback commit writes the new layout."""
        if "manifests" in snap:
            return snap
        parts = snap.get("partitions") or {}
        rows = [{"path": f, "partition": parts.get(f), "txn": snap.get("txn")}
                for f in snap.get("files", [])]
        snap = dict(snap)
        snap["manifests"] = [{
            "manifest": None, "rows": rows, "n_files": len(rows),
            "txns": [snap["txn"]] if snap.get("txn") else [],
            "summary": _build_summary(rows),
        }]
        return snap

    def _snap(self, table: str, version: int | None) -> dict:
        if version is None:
            snap = self._read_current(table)
        else:
            # any existing v<N>.json is a completed commit (the atomic
            # link that created it was the commit point), so time travel
            # may open it directly; a missing file is a hard error
            try:
                with open(os.path.join(self._meta(table),
                                       f"v{version}.json")) as f:
                    snap = json.load(f)
            except FileNotFoundError:
                raise FileNotFoundError(
                    f"version {version} of table {table!r} is not a "
                    "committed snapshot") from None
        if snap is None:
            raise FileNotFoundError(f"table not found: {table}")
        return self._upgrade_snap(snap)

    def _snap_files(self, snap: dict, missing_ok: bool = False) -> list[str]:
        """Resolve a snapshot's manifest list to its file list. With
        `missing_ok` (history/debug paths) entries whose manifest file was
        GC'd by a later vacuum resolve to nothing — expired snapshots keep
        their json but not necessarily their manifests; a missing manifest
        on the LIVE path stays a hard error (real corruption)."""
        out: list[str] = []
        for e in snap["manifests"]:
            if missing_ok and e.get("manifest") and \
                    not os.path.exists(e["manifest"]):
                continue
            out.extend(r["path"] for r in self._read_manifest(e))
        return sorted(out)

    # -- public API ---------------------------------------------------------
    def exists(self, table: str) -> bool:
        return self._read_current(table) is not None

    def snapshots(self, table: str, with_files: bool = False) -> list[dict]:
        """All retained snapshots, oldest first (vacuum may have expired
        older version jsons into _history.json). `with_files=True` attaches
        the resolved file list under "files" — a debug/test convenience that
        opens EVERY manifest of every snapshot, exactly what the scan and
        replay-check paths avoid; default off so no metadata-only caller
        pays O(history manifests) by accident."""
        meta = self._meta(table)
        if not os.path.isdir(meta):
            return []
        out = []
        for fn in sorted(os.listdir(meta)):
            if fn.startswith("v") and fn.endswith(".json"):
                # every v<N>.json is a completed commit (the atomic link
                # that created it was the commit point) — nothing to hide
                try:
                    with open(os.path.join(meta, fn)) as f:
                        snap = self._upgrade_snap(json.load(f))
                except FileNotFoundError:
                    continue  # expired by a concurrent vacuum between the
                    # listing and the open — it was already historical
                if with_files:
                    snap["files"] = self._snap_files(snap, missing_ok=True)
                out.append(snap)
        return sorted(out, key=lambda s: s["version"])

    def _stage(self, table: str, df: DataFrame,
               partition_by: list[str] | None = None,
               txn: str | None = None,
               stats_columns: list[str] | None = None,
               collect_stats: bool = True) -> list[dict]:
        """Write a staging commit; returns manifest rows
        [{"path", "partition", "txn", "stats"}] parsed from the hive-style
        directory layout. Partition columns are DUPLICATED into shadow
        `_p_<col>` dir keys so the data files keep the original column
        (snapshot reads use explicit file lists, which cannot recover
        dir-encoded values the way a directory scan would).

        Per-file column stats come from a footer-only metadata pass (no
        data pages): a driver loop for small commits, a distributed Spark
        job past STATS_DISTRIBUTE_MIN files — a 100k-file compaction's
        stats pass must scale with the cluster, not the driver."""
        stage_dir = os.path.join(self._tdir(table), "data", uuid.uuid4().hex)
        # Spark's default INT96 timestamp encoding carries NO parquet
        # column statistics (the physical type predates them); write
        # TIMESTAMP_MICROS so warc_ts-style columns are stats-skippable.
        # Scoped to this write and restored — the catalog must not leak
        # config into the caller's session.
        TS_KEY = "spark.sql.parquet.outputTimestampType"
        conf = df.sparkSession.conf
        ts_old = conf.get(TS_KEY)
        conf.set(TS_KEY, "TIMESTAMP_MICROS")
        try:
            if partition_by:
                from pyspark.sql import functions as F  # noqa: PLC0415

                shadowed = df.withColumns(
                    {f"_p_{c}": F.col(c).cast("string")
                     for c in partition_by})
                shadowed.write.partitionBy(
                    *[f"_p_{c}" for c in partition_by]
                ).mode("overwrite").parquet(stage_dir)
            else:
                df.write.mode("overwrite").parquet(stage_dir)
        finally:
            conf.set(TS_KEY, ts_old)
        rows: list[dict] = []
        for root, _dirs, fns in os.walk(stage_dir):
            pvals = {}
            rel = os.path.relpath(root, stage_dir)
            for seg in rel.split(os.sep):
                if "=" in seg and seg.startswith("_p_"):
                    k, v = seg.split("=", 1)
                    # Spark hive-escapes dir values (':' -> '%3A' etc.);
                    # record the UNESCAPED value or predicates with any
                    # escaped character would silently prune matching files.
                    # Null/empty values keep Spark's HIVE_NULL sentinel.
                    pvals[k[3:]] = urllib.parse.unquote(v)
            for fn in fns:
                if fn.endswith(".parquet"):
                    rows.append({
                        "path": os.path.join(root, fn),
                        "partition": dict(pvals) if pvals else None,
                        "txn": txn,
                    })
        rows.sort(key=lambda r: r["path"])
        if collect_stats and rows:
            paths = [r["path"] for r in rows]
            if len(paths) >= STATS_DISTRIBUTE_MIN:
                sc = df.sparkSession.sparkContext
                cols = stats_columns
                stats = dict(
                    sc.parallelize(paths, max(1, len(paths) // 16))
                    .map(lambda p: (p, _file_stats(p, cols)))
                    .collect())
            else:
                stats = {p: _file_stats(p, stats_columns) for p in paths}
            for r in rows:
                r["stats"] = stats[r["path"]]
        return rows

    def overwrite(self, table: str, df: DataFrame,
                  partition_by: list[str] | None = None,
                  txn: str | None = None,
                  stats_columns: list[str] | None = None,
                  collect_stats: bool = True) -> int:
        """Replace the table's contents. `txn` tags the commit the same way
        append's does, so writers with replace semantics (e.g. an index
        rebuild) get the same exactly-once replay detection via txns().
        A commit conflict rebases and retries: replace semantics clobber
        whatever the concurrent writer committed by DESIGN (the overwrite
        serializes after it)."""
        rows = self._stage(table, df, partition_by, txn=txn,
                           stats_columns=stats_columns,
                           collect_stats=collect_stats)
        entry = self._write_manifest(table, rows, [txn], op="overwrite")

        def build(cur):
            return dict(manifests=[entry], operation="overwrite",
                        parent=cur["version"] if cur else None, txn=txn,
                        schema=df.schema.json(),
                        all_txns=self._parent_txns(table, cur))

        return self._commit_rebased(table, build)

    @staticmethod
    def _merge_schema(old_json: str, new_schema) -> str:
        """Additive schema evolution (Iceberg add-column semantics): the
        recorded table schema gains any column the appended frame carries
        that the table lacks (forced nullable — existing files don't have
        it); a column present in both with a DIFFERENT type raises instead
        of silently corrupting reads. Dropped columns stay in the table
        schema (old files still hold them; readers see null for new
        files via the name-based parquet column resolution)."""
        from pyspark.sql.types import StructField, StructType  # noqa: PLC0415

        old = StructType.fromJson(json.loads(old_json))
        by_name = {f.name: f for f in old.fields}
        merged = list(old.fields)
        for f in new_schema.fields:
            have = by_name.get(f.name)
            if have is None:
                merged.append(StructField(f.name, f.dataType, nullable=True))
            elif have.dataType != f.dataType:
                raise ValueError(
                    f"schema evolution type conflict on column {f.name!r}: "
                    f"table has {have.dataType.simpleString()}, append has "
                    f"{f.dataType.simpleString()} (only additive evolution "
                    "is supported)")
        return StructType(merged).json()

    def append(self, table: str, df: DataFrame, txn: str | None = None,
               partition_by: list[str] | None = None,
               stats_columns: list[str] | None = None,
               collect_stats: bool = True) -> int:
        """Append with an optional transaction tag. A multi-table writer tags
        every table's append with one txn id and commits a marker table last;
        `remove_orphan_appends` can then roll back appends whose txn never
        reached the marker — pure metadata surgery, no data rewrite.

        Metadata cost is O(new files): one manifest for the added files plus
        a bounded manifest list (small manifests merge on commit).

        Schema evolution is additive: an appended frame may carry NEW
        columns (recorded nullable; readers see null for pre-evolution
        files via the recorded-schema read path); a type change on an
        existing column raises.

        Concurrent writers are safe: the staged files and the new
        manifest are parent-independent, so a commit conflict (another
        append/compact won the version) rebases the manifest LIST against
        the fresh snapshot and retries — neither writer's rows are lost
        (Iceberg's optimistic append)."""
        rows = self._stage(table, df, partition_by, txn=txn,
                           stats_columns=stats_columns,
                           collect_stats=collect_stats)
        entry = self._write_manifest(table, rows, [txn])

        def build(cur):
            entries = (list(cur["manifests"]) if cur else []) + [entry]
            entries = self._maybe_merge(table, entries)
            old_schema = (cur or {}).get("schema")
            schema = (self._merge_schema(old_schema, df.schema)
                      if old_schema else df.schema.json())
            return dict(manifests=entries, operation="append",
                        parent=cur["version"] if cur else None, txn=txn,
                        schema=schema,
                        all_txns=self._parent_txns(table, cur))

        return self._commit_rebased(table, build)

    def _parent_txns(self, table: str, cur: dict | None) -> set[str]:
        """Cumulative txn set to chain into a child commit. Read from the
        parent snapshot's `all_txns` summary (O(1)); a legacy parent written
        before the summary existed pays ONE O(versions) upgrade scan reading
        only the per-version `txn` field (no manifest resolution), and every
        later commit carries the summary forward."""
        if cur is None:
            return set()
        if "all_txns" in cur:
            return set(cur["all_txns"])
        return {s["txn"] for s in self.snapshots(table) if s.get("txn")}

    def txns(self, table: str) -> set[str]:
        """Transaction tags of all snapshots ever committed to `table` —
        including ones whose version metadata vacuum has since expired.

        O(1) metadata file opens (the _current pointer + the current
        snapshot's cumulative `all_txns` summary). This runs on EVERY
        streaming micro-batch and CLI run as the exactly-once replay check,
        so it must not walk table history: the round-4 implementation opened
        every version json AND resolved each one's manifests, O(batches x
        versions x manifests) over a stream's life. `last_txn_stats` records
        the opens for the flat-cost assertion in tests/test_tables_resume."""
        cur = self._read_current(table)
        if cur is None:
            self.last_txn_stats = {"meta_files_opened": 2}
            return set()
        if "all_txns" in cur:
            self.last_txn_stats = {"meta_files_opened": 2}
            return set(cur["all_txns"])
        # legacy table (pre-summary): per-version txn fields, no manifests.
        # snapshots() opens every listed version json — count them all
        # on top of this call's own _read_current opens
        meta = self._meta(table)
        n_v = (len([fn for fn in os.listdir(meta)
                    if fn.startswith("v") and fn.endswith(".json")])
               if os.path.isdir(meta) else 0)
        snaps = self.snapshots(table)
        self.last_txn_stats = {"meta_files_opened": 2 + n_v}
        return {s["txn"] for s in snaps if s.get("txn")}

    def remove_orphan_appends(self, table: str, live_txns: set[str]) -> int:
        """Drop the files added by tagged APPENDS whose txn is not in
        `live_txns` (i.e. the crash happened before the txn's marker commit).
        Untagged snapshots are always kept, and so are overwrite-originated
        manifests (each entry records its `op`): an overwrite's txn exists
        for replay detection only — rolling back a live index rebuild
        because its txn is outside some OTHER writer's marker set would
        drop a live table. Returns the number of files removed; commits one
        'rollback' snapshot iff anything was removed.

        Manifest-level surgery: an all-dead manifest is dropped from the
        list; a manifest the merge step mixed (dead + live txns) is
        rewritten without the dead files — O(affected manifests), never
        O(table files).

        Concurrency discipline (review finding): the dead-candidate set
        is FROZEN at the first snapshot read — a commit conflict retries
        the surgery against the fresh manifest list, but a txn that only
        appeared AFTER the first read (a concurrent writer's append,
        whose marker may have landed after the caller computed
        `live_txns`) is never a candidate, so the retry loop cannot
        widen the caller's stale view into deleting a committed
        transaction. Reconciliation remains a single-reconciler startup
        operation with respect to writers of the SAME marker protocol."""
        candidates: set[str] | None = None
        for _ in range(COMMIT_RETRIES):
            cur = self._read_current(table)
            if cur is None:
                return 0
            if candidates is None:
                seen = {t for e in cur["manifests"]
                        if e.get("op", "append") == "append"
                        for t in (e.get("txns") or [])}
                candidates = seen - set(live_txns)
            keep_entries: list[dict] = []
            n_removed = 0
            changed = False
            for e in cur["manifests"]:
                if e.get("op", "append") != "append":
                    keep_entries.append(e)  # overwrite commit: never a
                    continue                # rollback candidate
                txns = set(e.get("txns") or [])
                dead = txns & candidates
                if not dead:
                    keep_entries.append(e)
                    continue
                # a manifest with dead txns is always REWRITTEN from its
                # rows, never dropped by its entry-level txn set alone: the
                # set omits untagged (txn=None) rows a merge may have folded
                # in, and dropping the whole manifest would silently lose
                # them ('untagged appends are always kept' is the contract)
                rows = self._read_manifest(e)
                live_rows = [r for r in rows if r.get("txn") not in dead]
                n_removed += len(rows) - len(live_rows)
                changed = True
                if live_rows:
                    keep_entries.append(self._write_manifest(
                        table, live_rows, [r.get("txn") for r in live_rows]))
            if not (changed and n_removed):
                return 0
            try:
                self._commit(table, keep_entries, "rollback", cur["version"],
                             schema=cur.get("schema"),
                             all_txns=self._parent_txns(table, cur))
                return n_removed
            except ConcurrentCommitError:
                continue  # the conflicting version is a completed commit;
                # re-read and redo the surgery against the fresh list
        raise ConcurrentCommitError(
            f"gave up rolling back {table!r} after {COMMIT_RETRIES} rebases")

    def compact(self, spark: SparkSession, table: str,
                target_file_bytes: int = 128 * 1024 * 1024,
                live_txns: set[str] | None = None) -> dict:
        """Rewrite the current snapshot's data into right-sized files
        (Iceberg's rewriteDataFiles analogue). A streaming sink's per-batch
        appends accumulate small files — at 10^5 micro-batches a reader
        pays 10^5 footer opens per scan; compaction rewrites the SAME rows
        into ceil(bytes/target) files and commits one 'compact' snapshot.

        Partition layout is preserved: the partition columns recorded for
        every current file keep their hive-style directory encoding, so
        manifest-level pruning works identically on the compacted table.
        The rewritten manifest is untagged ('compact' op, txn=None) —
        never a rollback candidate — while the snapshot chains `all_txns`
        forward, so exactly-once replay checks for already-committed
        streaming batches still hold after compaction. Old files become
        unreferenced and are reclaimed by the next `vacuum`.

        TORN-TRANSACTION DISCIPLINE (review finding): folding rows into an
        untagged manifest permanently removes them from
        `remove_orphan_appends`' reach, so compacting a table that may
        hold appends whose marker commit never landed would freeze those
        orphans in place and the resumed run would duplicate them. Pass
        `live_txns` (the marker table's committed txn set) and compact
        reconciles torn appends FIRST, exactly like run_extraction does on
        start; multi-table writers (the CLI does this for the extraction
        trio) must reconcile before compacting.

        A commit CONFLICT REBASES instead of aborting (Iceberg's
        rewriteDataFiles validation-and-retry — round-5 verdict #1, so a
        streaming sink's per-few-seconds appends can never starve the
        maintenance job that exists because of them): compact validates
        that every file it rewrote is still referenced by the fresh
        snapshot, keeps verbatim any manifest whose files it did not
        touch (a racing append's — disjoint new data by construction),
        rewrites any manifest a racing merge mixed (replaced + new rows)
        down to just the new rows, and commits the compacted entry plus
        the survivors. Only a concurrent ROLLBACK/OVERWRITE/compact —
        one that removed files this compaction rewrote, making its
        output stale — still aborts with ConcurrentCommitError (the
        caller re-runs; staged files become vacuum-able orphans).

        Returns {"files_before", "files_after", "version",
        "orphans_removed"} (version=None when already at or below the
        target count)."""
        import math  # noqa: PLC0415

        cur = self._read_current(table)
        if cur is None:
            raise FileNotFoundError(f"table not found: {table}")
        n_orphans = 0
        if live_txns is not None:
            n_orphans = self.remove_orphan_appends(table, live_txns)
            cur = self._read_current(table)
        # pin the file list AND the data read to cur's version: a racing
        # append between these reads would otherwise leak rows into the
        # rewrite that the conflict rebase then double-counts
        files = self.scan_files(table, version=cur["version"])
        total = sum(os.path.getsize(f) for f in files)
        n_target = max(1, math.ceil(total / target_file_bytes))
        if len(files) <= n_target:
            return {"files_before": len(files), "files_after": len(files),
                    "version": None, "orphans_removed": n_orphans}
        # partition columns recorded for EVERY current file keep their
        # layout; a column only some files record cannot be trusted as a
        # table-level layout and is dropped from the rewrite
        part_cols: set[str] | None = None
        for e in cur["manifests"]:
            for r in self._read_manifest(e):
                cols = set((r.get("partition") or {}).keys())
                part_cols = cols if part_cols is None else (part_cols & cols)
        partition_by = sorted(part_cols) if part_cols else None
        df = self.read(spark, table, version=cur["version"])
        if partition_by is None:
            df = df.repartition(n_target)
        else:
            # co-locate each partition value so its files merge (a value
            # hashes to one task -> one right-sized file per value; a
            # value too big for one task should instead raise
            # target_file_bytes pressure via a salted repartition — out of
            # scope for this maintenance pass and noted here)
            df = df.repartition(max(n_target, 1), *partition_by)
        rows = self._stage(table, df, partition_by)
        entry = self._write_manifest(table, rows, [], op="compact")
        replaced = set(files)  # every file whose rows the rewrite holds
        entries = [entry]
        for _ in range(COMMIT_RETRIES):
            try:
                version = self._commit(
                    table, entries, "compact", cur["version"],
                    schema=cur.get("schema"),
                    all_txns=self._parent_txns(table, cur))
                return {"files_before": len(files), "files_after": len(rows),
                        "version": version, "orphans_removed": n_orphans}
            except ConcurrentCommitError:
                cur = self._read_current(table)
                entries = [entry] + self._rebase_compact(table, cur, replaced)
        raise ConcurrentCommitError(
            f"gave up compacting {table!r} after {COMMIT_RETRIES} rebases")

    def _rebase_compact(self, table: str, cur: dict,
                        replaced: set[str]) -> list[dict]:
        """Validation-and-retry surgery for a compact commit that lost a
        version race: against the FRESH snapshot, return the manifest
        entries to carry alongside the compacted one. An entry none of
        whose files were rewritten (a racing append) is kept verbatim; an
        entry fully covered by the rewrite is dropped (the compacted entry
        holds its rows); a MIXED entry (a racing `_maybe_merge` folded
        replaced rows together with a new append's) is rewritten down to
        just the non-replaced rows. Raises ConcurrentCommitError if any
        rewritten file is NO LONGER referenced — a concurrent rollback/
        overwrite/compact removed rows this compaction would resurrect,
        so its output is stale and the whole compaction must re-run."""
        keep: list[dict] = []
        still_live: set[str] = set()
        for e in cur["manifests"]:
            rows = self._read_manifest(e)
            mine = [r for r in rows if r["path"] in replaced]
            still_live.update(r["path"] for r in mine)
            others = [r for r in rows if r["path"] not in replaced]
            if not mine:
                keep.append(e)
            elif others:
                keep.append(self._write_manifest(
                    table, others, [r.get("txn") for r in others],
                    op=e.get("op", "append")))
            # else: fully replaced — the compacted entry carries its rows
        if still_live != replaced:
            raise ConcurrentCommitError(
                f"compaction of {table!r} is stale: a concurrent rollback/"
                "overwrite/compact removed files it rewrote — re-run "
                "compaction against the fresh snapshot")
        return keep

    def vacuum(self, table: str, keep_versions: int = 1,
               min_age_secs: float = VACUUM_MIN_AGE_SECS) -> int:
        """Delete data files not referenced by the newest `keep_versions`
        snapshots (Iceberg's expire-snapshots + orphan-file GC analogue —
        reclaims the files left behind by `remove_orphan_appends` rollbacks
        and by overwrites), plus manifest files no kept snapshot references,
        plus the expired versions' v<N>.json metadata itself — each expired
        snapshot leaves one summary line in `_meta/_history.json` (version,
        operation, txn, committed_at), so the audit trail survives at O(1)
        bytes per commit while the _meta dir stays bounded across unbounded
        append+vacuum cycles (a streaming sink's life is 10^5+ commits;
        keeping every version json made every listdir-based call pay for
        all of them). Time travel reaches the retained versions only.

        SAFE UNDER CONCURRENT WRITERS via the `min_age_secs` gate: an
        in-flight commit stages its data files and manifest BEFORE the
        atomic snapshot link, so at that instant they are unreferenced —
        indistinguishable from orphans by reference-counting alone. Every
        unreferenced-file deletion (staging data, manifests, claim/flip
        tempfiles) therefore skips files younger than the gate (Iceberg's
        remove-orphan-files has the same older-than requirement). Only
        set min_age_secs=0 when provably no writer is live. Returns data
        files deleted."""

        def _expired(path: str) -> bool:
            try:
                return time.time() - os.path.getmtime(path) > min_age_secs
            except OSError:
                return False  # vanished underneath us — nothing to delete
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
        keep_manifests: set[str] = set()
        for s in ([cur] if cur else []) + snaps[-keep_versions:]:
            # missing_ok: a later vacuum call with a LARGER keep_versions can
            # reach snapshots whose manifests a previous vacuum already GC'd
            keep.update(os.path.realpath(f)
                        for f in self._snap_files(s, missing_ok=True))
            keep_manifests.update(
                os.path.realpath(e["manifest"]) for e in s["manifests"]
                if e.get("manifest") and os.path.exists(e["manifest"]))
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
                # whole staging commit unreferenced — but a commit IN
                # FLIGHT (staged, not yet snapshot-linked) looks exactly
                # like this, so only a staging dir past the age gate is
                # an orphan (age = the newest write anywhere under it;
                # files vanishing mid-walk — a concurrent vacuum's rmtree
                # — read as age 0, i.e. skip this pass and let the next
                # vacuum see the settled state)
                def _mtime(p: str) -> float:
                    try:
                        return os.path.getmtime(p)
                    except OSError:
                        return time.time()
                newest = max([_mtime(sdir)] +
                             [_mtime(os.path.join(r, f))
                              for r, _d, fs in os.walk(sdir) for f in fs])
                if time.time() - newest <= min_age_secs:
                    continue
                import shutil  # noqa: PLC0415

                n += len(parquets)
                shutil.rmtree(sdir, ignore_errors=True)  # a concurrent
                # vacuum may have won the race for some files
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
        # expired manifests (metadata GC — the manifest list rewrites small
        # manifests on merge, and those originals are dead weight)
        meta = self._meta(table)
        for fn in os.listdir(meta):
            if fn.startswith("m-") and fn.endswith(".json"):
                # unreferenced manifest: either dead weight from a merge/
                # rollback rewrite, or an IN-FLIGHT commit's manifest
                # written just before its snapshot link — the age gate
                # tells them apart (ADVICE round-5: deleting a young one
                # let a racing writer publish a snapshot referencing a
                # deleted manifest)
                p = os.path.join(meta, fn)
                if os.path.realpath(p) not in keep_manifests and _expired(p):
                    os.remove(p)
            elif ".tmp." in fn:
                # snapshot/hint temp files a writer left by crashing
                # between its tmp write and link/replace; same age gate —
                # a LIVE writer mid-commit is never raced
                p = os.path.join(meta, fn)
                if _expired(p):
                    try:
                        os.remove(p)
                    except OSError:
                        pass
        # expired version jsons: everything older than the newest
        # keep_versions (and never _current's version), compacted to one
        # history line each. Cumulative txn summaries ride in the CURRENT
        # snapshot (all_txns), so expiry cannot break the exactly-once
        # replay check for old txns.
        keep_v = {s["version"] for s in snaps[-keep_versions:]}
        if cur:
            keep_v.add(cur["version"])
        # legacy guard: a table whose current snapshot predates the
        # all_txns summary must keep its version jsons — they are the only
        # record of historical txns, and expiring them would let a replayed
        # streaming batch re-append (exactly-once violation). The first
        # post-upgrade commit writes the summary and expiry starts working.
        if cur is not None and "all_txns" not in cur:
            keep_v.update(s["version"] for s in snaps)
        # the age gate applies to version jsons too (review finding): a
        # concurrent reader lists _meta then opens each version file, and
        # expiring a just-superseded version under it would race the open;
        # readers also tolerate the vanish (snapshots() skips), so the
        # gate is belt-and-braces for the freshest files only
        expired = [
            s for s in snaps
            if s["version"] not in keep_v and _expired(
                os.path.join(meta, f"v{s['version']}.json"))]
        if expired:
            hist = os.path.join(meta, "_history.json")
            with open(hist, "a") as f:
                for s in expired:
                    f.write(json.dumps({
                        "version": s["version"],
                        "operation": s.get("operation"),
                        "txn": s.get("txn"),
                        "committed_at": s.get("committed_at"),
                        "n_manifests": len(s.get("manifests") or []),
                    }) + "\n")
            for s in expired:
                vpath = os.path.join(meta, f"v{s['version']}.json")
                if os.path.exists(vpath):
                    os.remove(vpath)
        return n

    def scan_files(self, table: str, *, where: dict | None = None,
                   stats_where: dict | None = None,
                   version: int | None = None) -> list[str]:
        """Snapshot file list after MANIFEST-LEVEL pruning — the Iceberg
        move, in two stages: (1) the manifest LIST's per-manifest value
        summaries and column-stats summaries rule out whole manifests
        without opening them; (2) surviving manifests' per-file partition
        values and column min/max stats rule out files. Files without
        recorded values/stats for a predicate column are conservatively
        kept (pruning is an optimization; `read` applies the residual row
        filter). `where` predicates hit PARTITION values (string-cast
        compare, hive-null sentinel semantics); `stats_where` predicates
        hit footer-derived column stats with TYPED comparison — ints
        numerically, timestamps as instants — on any stats-collected
        column, partitioned or not. `self.last_scan_stats` records how
        much the scan pruned."""
        snap = self._snap(table, version)
        preds = {k: _normalize_pred(v) for k, v in (where or {}).items()}
        spreds = {k: _normalize_stats_pred(v)
                  for k, v in (stats_where or {}).items()}
        stats = {"manifests_total": len(snap["manifests"]),
                 "manifests_opened": 0, "files_selected": 0,
                 "files_skipped_by_stats": 0}
        files: list[str] = []
        for e in snap["manifests"]:
            summ = e.get("summary") or {}
            if preds and not all(
                    _match_summary(p, summ.get(c))
                    for c, p in preds.items()):
                continue  # manifest pruned: never opened
            ssumm = e.get("stats_summary") or {}
            if spreds and not all(
                    _match_stats(c, p, ssumm.get(c))
                    for c, p in spreds.items()):
                continue  # manifest pruned by column stats: never opened
            stats["manifests_opened"] += 1
            for r in self._read_manifest(e):
                part = r.get("partition") or {}
                if not all(_match_value(p, part.get(c))
                           for c, p in preds.items()):
                    continue
                fstats = r.get("stats") or {}
                if not all(_match_stats(c, p, fstats.get(c))
                           for c, p in spreds.items()):
                    stats["files_skipped_by_stats"] += 1
                    continue
                files.append(r["path"])
        stats["files_selected"] = len(files)
        self.last_scan_stats = stats
        return sorted(files)

    def read(self, spark: SparkSession, table: str,
             version: int | None = None,
             where: dict | None = None,
             stats_where: dict | None = None) -> DataFrame:
        """Read a snapshot; `where=` (partition values) and `stats_where=`
        (typed column min/max stats) prune at the manifest level (only
        matching files are opened) and apply residual row filters for
        exactness — stats skipping is sound-but-not-exact (a kept file may
        still hold no matching rows), so the typed residual closes it.

        The read uses the RECORDED snapshot schema (not a sampled file
        footer), so mixed-schema file sets read stably: after an additive
        schema evolution, pre-evolution files surface null for the new
        columns no matter which file a footer sample would have hit.
        Legacy snapshots without a recorded schema keep the footer path."""
        from pyspark.sql import functions as F  # noqa: PLC0415

        snap = self._snap(table, version)
        schema = None
        if snap.get("schema"):
            from pyspark.sql.types import StructType  # noqa: PLC0415

            schema = StructType.fromJson(json.loads(snap["schema"]))
        files = self.scan_files(table, where=where,
                                stats_where=stats_where, version=version)
        if not files:
            if not self._snap_files(snap):
                raise ValueError(f"empty table: {table}")
            # a predicate matching zero partitions is a normal query
            # outcome: empty result with the table's schema (recorded, or
            # one footer for legacy snapshots — never a full-footer merge)
            if schema is not None:
                return spark.createDataFrame([], schema)
            return spark.read.parquet(self._snap_files(snap)[0]).limit(0)
        reader = spark.read.schema(schema) if schema is not None \
            else spark.read
        df = reader.parquet(*files)
        for k, spec in (where or {}).items():
            df = df.filter(self._residual(F, df, k, _normalize_pred(spec)))
        for k, spec in (stats_where or {}).items():
            df = df.filter(self._stats_residual(
                F, df, k, _normalize_stats_pred(spec)))
        return df

    def read_incremental(self, spark: SparkSession, table: str,
                         since_version: int,
                         until_version: int | None = None) -> DataFrame:
        """Incremental (CDC-style) read: the rows ADDED by append commits
        in `(since_version, until_version]` (until defaults to the current
        snapshot), each tagged with `_commit_version` and `_commit_txn` —
        the Iceberg incremental-append-scan shape that lets a downstream
        consumer catch up on a table without re-reading it. `since_version
        = 0` streams the full history from table creation.

        Semantics per commit operation: `append` contributes its NEW
        manifest entries' files (manifest files are immutable and appends
        keep the parent's entries untouched, so the entry-path diff is
        exact and opens only the delta's manifests — O(new entries), not
        O(table)); `compact` is logically a no-op and contributes nothing;
        `overwrite` and `rollback` REMOVE rows, which an added-rows feed
        cannot express — they raise ValueError so a consumer can fall back
        to a full re-read instead of silently missing deletions. A
        vacuum-expired version inside the range raises FileNotFoundError
        (the delta is no longer reconstructible; re-read instead).

        Scale shape: the range walk is metadata-only (one version json per
        commit + only the NEW manifests), the whole delta reads as ONE
        parquet relation under the until-snapshot's recorded schema (plan
        size independent of the commit count — no per-commit union), and
        the file->commit tag map joins via a broadcast on the normalized
        input file name."""
        from pyspark.sql import functions as F  # noqa: PLC0415

        until = (until_version if until_version is not None
                 else self._current_version(table))
        if since_version < 0 or since_version > until:
            raise ValueError(
                f"read_incremental: need 0 <= since ({since_version}) "
                f"<= until ({until})")
        snap_u = self._snap(table, until) if until else None
        schema = None
        if snap_u and snap_u.get("schema"):
            from pyspark.sql.types import StructType  # noqa: PLC0415

            schema = StructType.fromJson(json.loads(snap_u["schema"]))

        def _entry_keys(snap: dict | None) -> set:
            if snap is None:
                return set()
            return {e.get("manifest") for e in snap["manifests"]}

        def _empty() -> DataFrame:
            if schema is not None:
                base = spark.createDataFrame([], schema)
            else:
                base = spark.range(0).drop("id")
            return (base
                    .withColumn("_commit_version",
                                F.lit(None).cast("int"))
                    .withColumn("_commit_txn",
                                F.lit(None).cast("string")))

        if since_version == until:
            return _empty()
        prev = self._snap(table, since_version) if since_version else None
        fmap: list[tuple[str, int, str | None]] = []
        for v in range(since_version + 1, until + 1):
            snap = self._snap(table, v)
            op = snap.get("operation")
            if op == "compact":
                prev = snap
                continue
            if op != "append" and not (op == "overwrite"
                                       and prev is None):
                raise ValueError(
                    f"read_incremental: version {v} of {table!r} is a "
                    f"'{op}' commit, which removes rows — an added-rows "
                    "feed cannot express it; re-read the table instead")
            seen = _entry_keys(prev)
            for e in snap["manifests"]:
                # manifest==None only on upgraded legacy snapshots; such
                # an entry can only be PARENT state (appends write real
                # manifest files), so the None key in `seen` handles it
                if e.get("manifest") in seen:
                    continue
                for r in self._read_manifest(e):
                    fmap.append((os.path.abspath(r["path"]), v,
                                 snap.get("txn")))
            prev = snap
        if not fmap:
            return _empty()
        reader = spark.read.schema(schema) if schema is not None \
            else spark.read
        df = reader.parquet(*sorted(p for p, _, _ in fmap))
        tags = spark.createDataFrame(
            fmap, "_path string, _commit_version int, _commit_txn string")
        norm = F.url_decode(
            F.regexp_replace(F.input_file_name(), "^[a-z]+:/+", "/"))
        return (df.withColumn("_path", norm)
                .join(F.broadcast(tags), "_path")
                .drop("_path"))

    @staticmethod
    def _residual(F, df: DataFrame, col: str, pred: tuple):
        """Row-level filter, EXACT where the hive dir encoding is lossy:
        null and '' share the sentinel dir (so both files are opened), but
        here None matches only NULL rows and '' only empty-string rows."""
        c = df[col].cast("string")
        op = pred[0]
        if op == "=":
            if pred[1] == HIVE_NULL:
                return c.isNull()
            return c == pred[1]
        if op == "in":
            non_null = [v for v in pred[1] if v != HIVE_NULL]
            cond = c.isin(non_null) if non_null else F.lit(False)
            if HIVE_NULL in pred[1]:
                cond = cond | c.isNull()
            return cond
        if op == ">=":
            return c >= pred[1]
        if op == "<=":
            return c <= pred[1]
        if op == ">":
            return c > pred[1]
        if op == "<":
            return c < pred[1]
        return (c >= pred[1]) & (c <= pred[2])  # between

    @staticmethod
    def _stats_residual(F, df: DataFrame, col: str, pred: tuple):
        """Typed row filter paired with stats skipping: compares in the
        COLUMN's type (no string cast — '9' vs '10' must order 9 < 10),
        using the predicate's original Python values."""
        c = df[col]
        op = pred[0]
        if op == "=":
            return c.isNull() if pred[2] is None else c == F.lit(pred[2])
        if op == "in":
            vals = [orig for _enc, orig in pred[1] if orig is not None]
            cond = c.isin(vals) if vals else F.lit(False)
            if any(orig is None for _enc, orig in pred[1]):
                cond = cond | c.isNull()
            return cond
        if op == ">=":
            return c >= F.lit(pred[2])
        if op == "<=":
            return c <= F.lit(pred[2])
        if op == ">":
            return c > F.lit(pred[2])
        if op == "<":
            return c < F.lit(pred[2])
        return (c >= F.lit(pred[3])) & (c <= F.lit(pred[4]))  # between
