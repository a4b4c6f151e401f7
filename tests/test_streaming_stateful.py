"""Stateful streaming sessionization == batch sessionization."""

from _intelligent_document_ai_for_field_extraction_from_invoices_spark.operators.sessionize import (
    session_counts,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_spark.streaming.stateful import (
    session_counts_stream,
)
from tests.conftest import SF_DIR


def test_stateful_stream_matches_batch(spark):
    got = {r.user_id: (r.n_sessions, r.n_events)
           for r in session_counts_stream(spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exp = {r.user_id: (r.n_sessions, r.n_events)
           for r in session_counts(ev).collect()}
    assert got == exp
