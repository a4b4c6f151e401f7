"""End-to-end distributed byte-identity — THE correctness gate.

BASELINE.json: "byte-identical extracted text per url" vs golden outputs,
verified under `python -m pytest -x -q`. The golden side is a sequential
driver-side loop over the same pure functions; the Spark side runs the full
distributed plan (salted shuffle + Arrow-batched extraction)."""

import pytest

from _intelligent_document_ai_for_field_extraction_from_invoices_spark import (
    datagen,
    golden,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_spark.operators.extract import (
    extract_pages,
)


@pytest.fixture(scope="module")
def golden_results(documents):
    rows = documents.select("doc_id", "text", "lang").collect()
    out = {}
    for r in rows:
        url = datagen.url_for(r.doc_id)
        out[url] = golden.extract_page(url, datagen.render_page(r.doc_id, r.text, r.lang))
    return out


def _spark_results(spark, documents, num_partitions):
    pages = datagen.pages_from_documents(documents)
    res = extract_pages(pages, num_partitions=num_partitions)
    return {r["url"]: r.asDict() for r in res.collect()}


def test_byte_identity_distributed(spark, documents, golden_results):
    got = _spark_results(spark, documents, num_partitions=8)
    assert set(got) == set(golden_results)
    n_bytes = 0
    for url, exp in golden_results.items():
        g = got[url]
        # the 100%-byte-match gate
        assert g["body_text"] == exp["body_text"], url
        for f in ("title", "byline", "pub_date", "status", "error_message",
                  "overall_confidence", "n_blocks_kept", "n_blocks_dropped",
                  "body_span_start", "body_span_len"):
            assert g[f] == exp[f], (url, f)
        n_bytes += len((g["body_text"] or "").encode())
    assert n_bytes > 0


def test_determinism_across_partitionings(spark, documents):
    """Same input at different partition counts -> identical outputs
    (guards argmax tie-breaks A1 and assembly W2 under redistribution)."""
    a = _spark_results(spark, documents, num_partitions=3)
    b = _spark_results(spark, documents, num_partitions=16)
    assert set(a) == set(b)
    for url in a:
        da, db = a[url], b[url]
        da.pop("part_id"), db.pop("part_id")
        assert da == db, url


def test_failed_rows_contained(spark, documents):
    got = _spark_results(spark, documents, num_partitions=4)
    failed = [g for g in got.values() if g["status"] == "failed"]
    # doc_id % 97 == 96 rows are empty payloads -> failed, never exceptions
    assert all(g["error_message"] == "empty" for g in failed)
    assert any(g["status"] == "success" for g in got.values())
