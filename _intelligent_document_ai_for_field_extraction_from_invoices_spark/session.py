"""SparkSession factory tuned for the extraction workload.

Arrow everywhere (the hot path is Arrow-batched UDFs over binary columns);
shuffle partitions sized to cores, AQE on, UTC session TZ so DuckDB oracle
comparisons are stable (duckdb timestamps are UTC-naive)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# html rows are large; cap Arrow batch row count so a batch of 2 MB pages
# stays well under worker memory (ref batch-size capping, vlm_fallback.py:93).
ARROW_MAX_RECORDS = 256


def get_spark(app: str = "webtext-extraction", cores: str | int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_MAX_RECORDS))
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cores in ("*", None) else int(cores)
        shuffle_partitions = max(8, int(n))
    b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
