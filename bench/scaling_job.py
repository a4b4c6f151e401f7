"""Standalone extraction job for the scaling benchmark.

Submitted via `spark-submit --master local[N] --py-files dist/engine.zip` at
two parallelism levels (N and 4N cores) on the SAME input — the sandbox
evidence for the north rule's two-cluster-size scaling criterion (no real
multi-executor cluster is available here; local[N] task-slot scaling is the
stand-in, as directed by BASELINE.md).

Prints one JSON line: {"cores": N, "wall_sec": ..., "bytes_out": ...,
"pages_per_sec": ..., "bytes_per_sec": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("SCALING_REPEAT", "2"))
    replicate = int(os.environ.get("SCALING_REPLICATE", "32"))
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cores = spark.sparkContext.defaultParallelism

    from _intelligent_document_ai_for_field_extraction_from_invoices_spark import (
        datagen,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_spark.operators.extract import (
        extract_pages,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # deterministic corpus amplification: the sf0.1 corpus alone finishes in
    # ~2 s, where task/scheduler overhead dominates and no parallelism level
    # can show scaling. Replicating doc_ids into disjoint ranges keeps every
    # flavor/oracle rule intact while giving each core real work.
    if replicate > 1:
        reps = spark.range(replicate).select(
            (F.col("id") * 10_000_000).alias("doc_off"))
        docs = (
            docs.crossJoin(reps)
            .withColumn("doc_id", F.col("doc_id") + F.col("doc_off"))
            .drop("doc_off")
        )
    pages = datagen.pages_from_documents(docs).cache()
    n_pages = pages.count()  # corpus materialized before the timed window
    bytes_in = pages.agg(F.sum(F.length("html"))).first()[0]

    best = None
    for _ in range(repeat):  # take the best of `repeat` runs (warm workers)
        t0 = time.perf_counter()
        row = (
            extract_pages(pages, num_partitions=cores * 2)
            .agg(F.count("*"), F.sum(F.length("body_text")))
            .first()
        )
        wall = time.perf_counter() - t0
        if best is None or wall < best[0]:
            best = (wall, row[0], row[1])

    wall, n_rows, bytes_out = best
    print(json.dumps({
        "cores": cores,
        "pages": n_pages,
        "rows": n_rows,
        "bytes_in": bytes_in,
        "bytes_out": bytes_out,
        "wall_sec": round(wall, 3),
        "pages_per_sec": round(n_pages / wall, 1),
        "bytes_per_sec": round(bytes_out / wall),
    }))


if __name__ == "__main__":
    main()
