import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from _intelligent_document_ai_for_field_extraction_from_invoices_spark.session import get_spark

    s = get_spark("tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def drain_stream_to_memory(df, mode: str = "append"):
    """Run a bounded streaming DataFrame to completion through a memory sink
    and return the collected result as a batch DataFrame. TEST-ONLY: a
    memory sink materializes every output row in the driver, which is why
    this helper lives here and not in the library (round-2 verdict #5)."""
    import uuid

    spark = df.sparkSession
    name = f"drain_{uuid.uuid4().hex[:8]}"
    q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")
