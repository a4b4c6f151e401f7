"""Streaming main-content extraction — the flagship operator over readStream.

The batch `extract_pages` operator (salted shuffle -> Arrow-batched golden
extraction) works UNCHANGED on a streaming DataFrame: `repartition` is a
stateless shuffle and `mapInPandas` a stateless projection, both allowed in
streaming plans, so per-url byte identity holds micro-batch by micro-batch.
That composability — one operator definition, batch and stream — is the
Spark-first payoff the reference's thread-pool file loop cannot express.

Streaming exact-dedup is `dropDuplicates` on the content digest: Spark keeps
the seen-digest set in state; production feeds bound the state with
`withWatermark` on the event-time column (documented inline)."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_pages


def _drain_to_memory(df: DataFrame, prefix: str, mode: str) -> tuple:
    spark = df.sparkSession
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark, name


def extraction_stream(spark: SparkSession, pages_dir: str,
                      num_partitions: int = 8,
                      files_per_trigger: int | None = None) -> DataFrame:
    """readStream over a pages parquet directory -> extract_pages -> memory
    sink, drained to completion (bounded source). `files_per_trigger` splits
    the run into several micro-batches to exercise incremental progress."""
    schema = spark.read.parquet(pages_dir).schema
    reader = spark.readStream.schema(schema)
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    stream = reader.parquet(pages_dir)
    results = extract_pages(stream, num_partitions=num_partitions)
    spark, name = _drain_to_memory(results, "extract", "append")
    return spark.sql(f"SELECT * FROM {name}")


def exact_dedup_stream(spark: SparkSession, docs_dir: str,
                       text_col: str = "text") -> DataFrame:
    """Streaming exact dedup: first-seen row per content digest survives.
    Unbounded digest state for the bounded test source; a live feed would
    add `.withWatermark(ts_col, horizon)` + the digest to bound state."""
    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    deduped = (
        stream.withColumn("digest", F.md5(F.col(text_col)))
        .dropDuplicates(["digest"])
    )
    spark, name = _drain_to_memory(deduped, "dedup", "append")
    return spark.sql(f"SELECT * FROM {name}")


def extraction_stream_query(spark: SparkSession, pages_dir: str,
                            out_dir: str, checkpoint_dir: str,
                            num_partitions: int = 8,
                            files_per_trigger: int | None = None):
    """Start (without draining) a streaming extraction that appends parquet
    with a checkpoint. Stopping the query and restarting with the SAME
    checkpoint resumes exactly-once from the last committed micro-batch —
    the streaming analogue of the batch pipeline's partition checkpoint
    (plans/lineage.py). Returns the live StreamingQuery."""
    schema = spark.read.parquet(pages_dir).schema
    reader = spark.readStream.schema(schema)
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    stream = reader.parquet(pages_dir)
    results = extract_pages(stream, num_partitions=num_partitions)
    return (
        results.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_to_catalog(spark: SparkSession, pages_dir: str, catalog,
                      table: str, checkpoint_dir: str,
                      num_partitions: int = 8,
                      files_per_trigger: int | None = None):
    """Streaming extraction into an Iceberg-style Catalog table, exactly
    once: each micro-batch is appended inside `foreachBatch` tagged with a
    deterministic txn id ('stream:<table>:<batch_id>'). Structured
    Streaming may RE-RUN a batch after a crash-restart (foreachBatch is
    at-least-once); the txn check makes the replay a no-op, upgrading the
    sink to exactly-once — the same marker discipline as the batch
    pipeline's checkpoint commit (plans/lineage.py). Returns the query."""
    schema = spark.read.parquet(pages_dir).schema
    reader = spark.readStream.schema(schema)
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    stream = reader.parquet(pages_dir)
    results = extract_pages(stream, num_partitions=num_partitions)

    def write_batch(df, batch_id: int):
        txn = f"stream:{table}:{batch_id}"
        if catalog.exists(table) and txn in catalog.txns(table):
            return  # replayed micro-batch: already durably committed
        catalog.append(table, df, txn=txn)

    return (
        results.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
