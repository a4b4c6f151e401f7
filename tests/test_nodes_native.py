"""Parity: the relational twin (explode -> native exprs -> window argmax)
must agree with the golden in-UDF path on every HTML page (SURVEY M3)."""

import pytest
from pyspark.sql import functions as F

from _intelligent_document_ai_for_field_extraction_from_invoices_spark import (
    datagen,
    golden,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_spark.operators import (
    nodes as nodes_op,
)


@pytest.fixture(scope="module")
def html_pages(spark, documents):
    # HTML flavors only: the relational twin is the non-PDF branch
    return datagen.pages_from_documents(documents).filter(
        F.substring("html", 1, 5) != b"%PDF-"
    )


@pytest.fixture(scope="module")
def golden_map(documents):
    rows = documents.select("doc_id", "text", "lang").collect()
    out = {}
    for r in rows:
        if datagen.flavor_for(r.doc_id) in ("empty", "pdf"):
            continue
        url = datagen.url_for(r.doc_id)
        out[url] = golden.extract_page(
            url, datagen.render_page(r.doc_id, r.text, r.lang))
    return out


@pytest.fixture(scope="module")
def node_df(spark, html_pages):
    return nodes_op.tokenize_nodes(html_pages).cache()


def test_node_stream_matches_golden_tokenizer(node_df, golden_map):
    counts = {r.url: r.n for r in
              node_df.filter((F.col("node_idx") >= 0)
                             & ~F.col("tag").startswith("_"))
              .groupBy("url").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(golden_map)
    for url, exp in golden_map.items():
        assert counts[url] == exp["n_nodes"], url


def test_native_body_assembly_byte_identity(node_df, golden_map):
    got = {r.url: (r.body_text, r.n_blocks_kept, r.body_span_start)
           for r in nodes_op.assemble_body_native(node_df).collect()}
    for url, exp in golden_map.items():
        if not exp["body_text"]:
            assert url not in got
            continue
        body, kept, span = got[url]
        assert body == exp["body_text"], url
        assert kept == exp["n_blocks_kept"], url
        assert span == exp["body_span_start"], url


def test_native_field_argmax_parity(node_df, golden_map):
    got = {r.url: r for r in nodes_op.best_fields(node_df).collect()}
    for url, exp in golden_map.items():
        g = got[url]
        assert g.title == exp["title"], url
        assert g.byline == exp["byline"], url
        assert g.pub_date == exp["pub_date"], url


def test_enriched_scores_match_golden(node_df, golden_map):
    sample = nodes_op.enrich_nodes(node_df).limit(500).collect()
    for n in sample:
        assert n.score == golden.block_score(n.tag, n.n_chars, n.n_link_chars)
