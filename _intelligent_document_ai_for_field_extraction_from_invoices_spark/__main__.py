"""CLI batch entry point — the flagship path (SURVEY §3.1, mirroring the
reference's `python executable.py --input DIR [--workers N --limit K ...]`,
executable.py:723-833).

    python -m _intelligent_document_ai_for_field_extraction_from_invoices_spark \
        --input /root/testdata/sf0.001 --output /tmp/out_catalog \
        [--limit K] [--partitions P] [--cores N] [--run-id ID]

Reads the documents table under --input, synthesises the page corpus,
runs the resumable extraction (checkpoint + lineage tables in the output
catalog), and prints a summary (the reference's console report analogue,
executable.py:683-720).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from . import datagen
from .plans import lineage
from .session import get_spark
from .sources.tables import Catalog


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="webtext-extract")
    ap.add_argument("--input", required=True,
                    help="directory containing documents.parquet")
    ap.add_argument("--output", required=True, help="output catalog directory")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--cores", default=None)
    ap.add_argument("--run-id", default="cli-run")
    ap.add_argument("--vacuum", action="store_true",
                    help="after the run, delete data files not referenced by"
                         " current snapshots (expired/rolled-back commits)")
    args = ap.parse_args(argv)

    spark = get_spark("webtext-extract-cli", cores=args.cores)
    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    if args.limit:
        docs = docs.limit(args.limit)
    pages = datagen.pages_from_documents(docs)
    catalog = Catalog(args.output)
    stats = lineage.run_extraction(
        spark, pages, catalog, args.run_id, num_partitions=args.partitions
    )

    n_vacuumed = 0
    if args.vacuum:
        for t in (lineage.RESULTS_TABLE, lineage.LINEAGE_TABLE,
                  lineage.CHECKPOINT_TABLE):
            n_vacuumed += catalog.vacuum(t)

    results = catalog.read(spark, lineage.RESULTS_TABLE)
    summary = results.agg(
        F.count("*").alias("documents"),
        F.sum(F.when(F.col("status") == "success", 1).otherwise(0)).alias("ok"),
        F.round(F.avg("overall_confidence"), 4).alias("mean_confidence"),
        F.sum(F.length("body_text")).alias("extracted_bytes"),
    ).first()
    print(json.dumps({
        "run": stats,
        "documents": summary.documents,
        "success_rate": round(summary.ok / max(summary.documents, 1), 4),
        "mean_confidence": summary.mean_confidence,
        "extracted_bytes": summary.extracted_bytes,
        "tables": {t: len(catalog.snapshots(t)) for t in
                   (lineage.RESULTS_TABLE, lineage.LINEAGE_TABLE,
                    lineage.CHECKPOINT_TABLE)},
        "files_vacuumed": n_vacuumed,
    }))


if __name__ == "__main__":
    main()
