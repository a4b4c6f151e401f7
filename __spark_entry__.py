"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship distributed extraction over pages synthesised from
                /root/testdata/sf0.001/documents.parquet (Common-Crawl-style
                corpus per BASELINE.json input_hint).
queries()     — one entry per implemented operator from SURVEY.md §2.
oracle_sql()  — DuckDB-runnable ANSI SQL oracles (same column names/rounding).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _intelligent_document_ai_for_field_extraction_from_invoices_spark import (  # noqa: E402
    contract,
    datagen,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_spark.operators.extract import (  # noqa: E402
    extract_pages,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full main-content extraction pipeline (HTML+PDF ->
    DOM node streams -> density-scored blocks -> validated field rows)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = datagen.pages_from_documents(docs)
    return extract_pages(pages)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(contract.ORACLES)
