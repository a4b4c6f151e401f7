"""Structured Streaming source over the catalog's commit log.

`spark.readStream.format("catalog_cdc")` turns any catalog table into a
CDC feed: each micro-batch is exactly the rows appended by the commits
between two snapshot versions (the same delta semantics as
`Catalog.read_incremental`), tagged with `_commit_version`/`_commit_txn`.
Offsets ARE snapshot versions, so Structured Streaming's checkpointing
gives exactly-once delivery for free: a restarted query resumes from the
last committed version, never re-reading or skipping a commit.

Built on PySpark 4's Python DataSource API (pyspark.sql.datasource — a
public, documented extension point). Batches are yielded as Arrow
RecordBatches, so rows never materialize through Python objects.

Semantics (mirroring read_incremental):
- `append` commits contribute their NEW manifest entries' files
  (manifest files are immutable; the entry-path diff opens only the
  delta's manifests — O(new entries) metadata per batch).
- `compact` commits are logically no-ops and contribute nothing.
- `overwrite`/`rollback` REMOVE rows — the stream fails loudly instead
  of silently missing deletions (restart with a fresh `sinceversion`
  after a table replace).
- An initial `overwrite` (table creation) before the stream's start
  offset is never read; start the stream with `sinceversion=0` to
  consume a table from its creation.

Options: `path` (catalog root), `table`, `sinceversion` (start version,
default = the CURRENT version at stream start, i.e. only NEW commits).

Scale shape: offset math is metadata-only; each file is one input
partition, so read parallelism equals the delta's file count and a
1000-executor cluster fans the backlog out naturally. Streaming-source
progress (rows/batch, backlog versions) surfaces through the normal
StreamingQuery progress events.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import IntegerType, StringType, StructType

from ..sources.tables import Catalog

FORMAT_NAME = "catalog_cdc"
META_COLS = ("_commit_version", "_commit_txn")


class _FileSlice(InputPartition):
    def __init__(self, path: str, version: int, txn: str | None):
        self.path = path
        self.version = version
        self.txn = txn


def _base_schema(root: str, table: str) -> StructType:
    cat = Catalog(root)
    snap = cat._read_current(table)
    if snap is None:
        raise ValueError(f"catalog_cdc: table not found: {table!r} "
                         f"(root {root!r})")
    if not snap.get("schema"):
        raise ValueError(
            f"catalog_cdc: table {table!r} predates recorded schemas — "
            "rewrite it (overwrite/compact) once to record one")
    return StructType.fromJson(json.loads(snap["schema"]))


class CatalogCdcStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._root = options["path"]
        self._table = options["table"]
        self._schema = schema
        since = options.get("sinceversion")
        if since is not None:
            self._start = int(since)
        else:
            self._start = Catalog(self._root)._current_version(self._table)

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version":
                Catalog(self._root)._current_version(self._table)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        cat = Catalog(self._root)
        a, b = int(start["version"]), int(end["version"])
        prev = cat._snap(self._table, a) if a else None
        out: list[InputPartition] = []
        for v in range(a + 1, b + 1):
            snap = cat._snap(self._table, v)
            op = snap.get("operation")
            if op == "compact":
                prev = snap
                continue
            if op != "append" and not (op == "overwrite"
                                       and prev is None):
                raise ValueError(
                    f"catalog_cdc: version {v} of {self._table!r} is a "
                    f"'{op}' commit, which removes rows — an append feed "
                    "cannot express it; restart the stream with a fresh "
                    "sinceversion")
            seen = {e.get("manifest")
                    for e in (prev["manifests"] if prev else [])}
            for e in snap["manifests"]:
                if e.get("manifest") in seen:
                    continue
                for r in cat._read_manifest(e):
                    out.append(_FileSlice(os.path.abspath(r["path"]), v,
                                          snap.get("txn")))
            prev = snap
        return out

    def read(self, partition: _FileSlice):
        # executor-side: one parquet file -> Arrow batches + commit tags;
        # columns align to the STREAM schema (a pre-evolution file
        # surfaces null for columns it predates — same contract as
        # Catalog.read)
        import pyarrow as pa  # noqa: PLC0415
        import pyarrow.parquet as pq  # noqa: PLC0415

        from pyspark.sql.pandas.types import (  # noqa: PLC0415
            to_arrow_schema,
        )

        tbl = pq.read_table(partition.path)
        n = tbl.num_rows
        want = to_arrow_schema(self._schema)
        cols = []
        for field in want:
            if field.name == "_commit_version":
                cols.append(pa.array([partition.version] * n,
                                     type=field.type))
            elif field.name == "_commit_txn":
                cols.append(pa.array([partition.txn] * n,
                                     type=field.type))
            elif field.name in tbl.column_names:
                cols.append(tbl.column(field.name).cast(field.type)
                            .combine_chunks())
            else:
                cols.append(pa.nulls(n, type=field.type))
        aligned = pa.table(cols, schema=want)
        yield from aligned.to_batches()

    def commit(self, end: dict) -> None:
        pass  # versions are durable snapshots; nothing to clean up


class CatalogCdcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        st = _base_schema(self.options["path"], self.options["table"])
        return (st.add("_commit_version", IntegerType())
                .add("_commit_txn", StringType()))

    def streamReader(self, schema: StructType) -> CatalogCdcStreamReader:
        return CatalogCdcStreamReader(schema, self.options)


def register_cdc_source(spark) -> None:
    """Idempotently register the catalog_cdc streaming format on a
    session; after this, `spark.readStream.format("catalog_cdc")
    .option("path", root).option("table", t).load()` works."""
    spark.dataSource.register(CatalogCdcDataSource)
