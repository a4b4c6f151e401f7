"""Evaluation job (results vs golden) + broadcast master-data joins."""

import pytest
from pyspark.sql import functions as F

from _intelligent_document_ai_for_field_extraction_from_invoices_spark import datagen
from _intelligent_document_ai_for_field_extraction_from_invoices_spark.operators import (
    evaluate as ev,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_spark.operators import (
    master,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_spark.operators.extract import (
    extract_pages,
)


@pytest.fixture(scope="module")
def results(spark, documents):
    pages = datagen.pages_from_documents(documents)
    return extract_pages(pages).cache()


@pytest.fixture(scope="module")
def golden_table(spark, documents):
    """Golden values recomputed from the mirrored doc_id arithmetic."""
    rows = documents.select("doc_id", "text").collect()
    out = []
    for r in rows:
        flavor = datagen.flavor_for(r.doc_id)
        if flavor == "empty":
            continue
        byline = (datagen.ml_author_for(r.doc_id) if flavor == "ml"
                  else datagen.author_for(r.doc_id))
        out.append((
            datagen.url_for(r.doc_id),
            datagen.title_for(r.doc_id, r.text.split()),
            byline,
            datagen.date_for(r.doc_id),
            datagen.expected_body(r.doc_id, r.text),
        ))
    return spark.createDataFrame(
        out, "url string, title string, byline string, pub_date string, "
             "body_text string")


def test_eval_pipeline_is_perfect_on_golden(spark, results, golden_table):
    ok = results.filter(F.col("status") == "success")
    joined = ev.joined_eval(ok, golden_table)
    prf = {r.field: r for r in ev.field_prf(joined).collect()}
    for f in ("title", "byline", "pub_date"):
        assert prf[f].precision == 1.0, f
        assert prf[f].recall == 1.0, f
        assert prf[f].f1 == 1.0, f
    acc = ev.document_accuracy(joined).first()
    assert acc.doc_accuracy == 1.0
    assert acc.body_byte_match_rate == 1.0  # the 100%-byte-match gate


def test_eval_detects_corruption(spark, results, golden_table):
    ok = results.filter(F.col("status") == "success")
    corrupted = ok.withColumn(
        "title", F.when(F.col("url").endswith("0"), F.lit("Wrong Title XYZ"))
        .otherwise(F.col("title"))
    ).withColumn(
        "body_text", F.concat(F.col("body_text"), F.lit("TAMPER"))
    )
    joined = ev.joined_eval(corrupted, golden_table)
    prf = {r.field: r for r in ev.field_prf(joined).collect()}
    assert prf["title"].precision < 1.0
    acc = ev.document_accuracy(joined).first()
    assert acc.body_byte_match_rate == 0.0
    assert acc.doc_accuracy == 0.0


def test_confidence_distribution_and_errors(spark, results):
    dist = ev.confidence_distribution(
        results.filter(F.col("status") == "success")).first()
    assert 0.3 <= dist.mean <= 0.98
    assert dist.n_high + dist.n_medium + dist.n_low > 0
    errs = {r.category: r.n for r in ev.error_breakdown(results).collect()}
    assert errs.get("empty_input", 0) > 0
    assert errs["none"] > 0


def test_eval_markdown_report(spark, results, golden_table):
    from _intelligent_document_ai_for_field_extraction_from_invoices_spark.reporting import (
        render_eval_report,
    )

    ok = results.filter(F.col("status") == "success")
    md = render_eval_report(ok, golden_table)
    assert "body byte-match rate: 100.00%" in md
    assert "| title |" in md and "| pub_date |" in md
    assert "## Errors" in md


def test_fuzzy_site_match(spark, results):
    m = master.default_site_master(spark)
    named = results.filter(F.col("status") == "success").withColumn(
        "title", F.lit("example site 3"))  # token-sorted exact vs master row 3
    got = master.fuzzy_match_site(named.limit(5), m)
    rows = got.collect()
    assert len(rows) == 5
    assert all(r.canonical_name == "Example Site 3" for r in rows)
    assert all(r.match_score == 1.0 for r in rows)


def test_expected_lang_validation(spark, results, documents):
    docs = documents.select(
        F.col("doc_id"), F.col("lang")
    )
    with_lang = results.withColumn(
        "doc_id", F.regexp_extract("url", r"doc-(\d+)$", 1).cast("long")
    ).join(docs, "doc_id")
    m = master.default_site_master(spark)
    got = master.validate_expected_lang(with_lang, m)
    rows = got.collect()
    assert len(rows) == results.count()
    assert all(r.expected_lang is not None for r in rows)  # every host known
    assert any(r.lang_ok for r in rows) and any(r.lang_ok is False for r in rows)
