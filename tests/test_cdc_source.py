"""Streaming CDC source over the catalog commit log (streaming/
cdc_source.py): offsets are snapshot versions, so Structured Streaming
checkpointing gives exactly-once delivery across restarts."""

import pytest
from pyspark.sql import functions as F

from _intelligent_document_ai_for_field_extraction_from_invoices_spark.sources.tables import (
    Catalog,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_spark.streaming.cdc_source import (
    register_cdc_source,
)


def _run_once(spark, root, ckpt, sink, since="0"):
    reader = (spark.readStream.format("catalog_cdc")
              .option("path", root).option("table", "t"))
    if since is not None:
        reader = reader.option("sinceversion", since)
    q = (reader.load()
         .writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)


def test_cdc_stream_exactly_once_across_restarts(spark, tmp_path):
    """Appends flow tagged with their commit version/txn; compact
    contributes nothing; a restarted query resumes from the checkpoint
    (no dupes, no gaps); a no-new-commits restart is a no-op."""
    root, ckpt = str(tmp_path / "cat"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    cat = Catalog(root)
    cat.overwrite("t", spark.range(3).withColumn("v", F.col("id") * 10))
    register_cdc_source(spark)
    _run_once(spark, root, ckpt, sink)
    first = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    assert [r[0] for r in first] == [0, 1, 2]
    assert {r[2] for r in first} == {1}  # the creating overwrite

    cat.append("t", spark.range(3, 5).withColumn("v", F.col("id") * 10),
               txn="r2")
    cat.compact(spark, "t")
    cat.append("t", spark.range(5, 6).withColumn("v", F.col("id") * 10),
               txn="r3")
    _run_once(spark, root, ckpt, sink)
    rows = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    assert len(rows) == 6 and len(set(r[0] for r in rows)) == 6
    by_id = {r[0]: r for r in rows}
    assert by_id[3][3] == "r2" and by_id[5][3] == "r3"
    # compact's version number is absent from the feed
    compact_v = [s["version"] for s in cat.snapshots("t")
                 if s["operation"] == "compact"]
    assert compact_v and not ({r[2] for r in rows} & set(compact_v))

    _run_once(spark, root, ckpt, sink)  # nothing new -> no-op
    assert spark.read.parquet(sink).count() == 6


def test_cdc_stream_default_start_is_current_version(spark, tmp_path):
    """Without sinceversion the stream tails only commits AFTER stream
    creation — the history is not replayed."""
    root, ckpt = str(tmp_path / "cat"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    cat = Catalog(root)
    cat.overwrite("t", spark.range(10).withColumn("v", F.col("id")))
    register_cdc_source(spark)
    _run_once(spark, root, ckpt, sink, since=None)
    # sink may not even exist if zero rows were written
    try:
        n0 = spark.read.parquet(sink).count()
    except Exception:
        n0 = 0
    assert n0 == 0
    cat.append("t", spark.range(10, 12).withColumn("v", F.col("id")),
               txn="new")
    _run_once(spark, root, ckpt, sink, since=None)
    rows = spark.read.parquet(sink).collect()
    assert sorted(r.id for r in rows) == [10, 11]


def test_cdc_stream_fails_loudly_on_overwrite(spark, tmp_path):
    """A table replace inside the offset range kills the stream with a
    clear error instead of silently missing the removed rows."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    root, ckpt = str(tmp_path / "cat"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    cat = Catalog(root)
    cat.overwrite("t", spark.range(3).withColumn("v", F.col("id")))
    register_cdc_source(spark)
    _run_once(spark, root, ckpt, sink)
    cat.overwrite("t", spark.range(2).withColumn("v", F.col("id")))
    with pytest.raises(StreamingQueryException, match="overwrite"):
        q = (spark.readStream.format("catalog_cdc")
             .option("path", root).option("table", "t")
             .option("sinceversion", "0").load()
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
