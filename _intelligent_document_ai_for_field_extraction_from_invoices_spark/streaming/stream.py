"""Structured Streaming variants of the batch operators.

The reference has NO streaming operators (SURVEY §2.9 — its 'streaming' is a
file iterator), so these are engine extensions: the same tumbling-window and
extraction logic expressed over readStream, verified against the batch result
in tests (memory sink + processAllAvailable drives a bounded parquet source
to completion synchronously)."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_event_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts over a streaming read of the events table;
    returns the completed result as a DataFrame (memory sink)."""
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .parquet(f"{sf_dir}")  # directory scan picks up events.parquet
    )
    # bounded batch source -> 'complete' aggregation, no watermark needed;
    # a live feed would add .withWatermark("ts", "1 hour")
    agg = (
        stream.filter(F.col("event_id").isNotNull())
        .groupBy(F.date_format("ts", "yyyy-MM-dd HH:00").alias("hour"))
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )
    name = f"hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")
