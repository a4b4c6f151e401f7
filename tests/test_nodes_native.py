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


MULTI_META = b"""<html><head>
<meta property="og:title" content="First OG Title">
<meta property="og:title" content="Second OG Title Different">
<meta name="parsely-author" content="Low Priority Author">
<meta name="author" content="High Priority Author">
<meta name="author" content="Second Author Occurrence">
<meta name="pubdate" content="2023-02-02">
<meta property="article:published_time" content="2021-05-06">
<meta name="date" content="2022-01-01">
</head><body>
<p>Body paragraph long enough to be kept by the density classifier rules.</p>
</body></html>"""

FALLBACK_ONLY = b"""<html><body>
<h2>A heading that the fallback tier must skip entirely</h2>
<nav><a href="/x">linky linky linky navigation</a></nav>
<p>short one</p>
<p>short two here</p>
</body></html>"""


def _native_one(spark, url, html):
    pages = spark.createDataFrame([(url, bytearray(html))],
                                  "url string, html binary")
    nd = nodes_op.tokenize_nodes(pages)
    fields = {r.url: r for r in nodes_op.best_fields(nd).collect()}
    body = {r.url: r for r in nodes_op.assemble_body_native(nd).collect()}
    return fields.get(url), body.get(url)


def test_meta_key_priority_and_first_occurrence_parity(spark):
    """ADVICE regression: duplicate og:title/author/date metas — golden's
    _meta_get takes the first meta in key-priority order; the native twin
    must not emit one candidate per matching meta row."""
    exp = golden.extract_page("u", MULTI_META)
    fields, _ = _native_one(spark, "u", MULTI_META)
    assert fields.title == exp["title"] == "First OG Title"
    assert fields.byline == exp["byline"] == "High Priority Author"
    assert fields.pub_date == exp["pub_date"] == "2021-05-06"


def test_fallback_tier_parity(spark):
    """ADVICE regression: when the density classifier keeps nothing, the
    native twin must reproduce golden's tier-2 fallback body (non-boiler,
    non-heading nodes >= FALLBACK_MIN_CHARS at fixed conf)."""
    exp = golden.extract_page("u", FALLBACK_ONLY)
    assert exp["body_text"]  # page exercises the fallback tier
    _, body = _native_one(spark, "u", FALLBACK_ONLY)
    assert body is not None
    assert body.body_text == exp["body_text"]
    assert body.n_blocks_kept == exp["n_blocks_kept"]
    assert body.body_conf_raw == golden.FALLBACK_BODY_CONF


def test_multilingual_parity(spark):
    """The native twin must reproduce golden's Hindi/Gujarati byline/date
    extraction on ml-flavor pages (VERDICT 'missing' #2)."""
    text = " ".join(f"w{i}q" for i in range(40))
    checked = 0
    for doc_id in range(0, 400):
        if datagen.flavor_for(doc_id) != "ml":
            continue
        url = datagen.url_for(doc_id)
        html = datagen.render_page(doc_id, text, "hi")
        exp = golden.extract_page(url, html)
        fields, _ = _native_one(spark, url, html)
        assert fields.byline == exp["byline"] == datagen.ml_author_for(doc_id)
        assert fields.pub_date == exp["pub_date"] == datagen.date_for(doc_id)
        checked += 1
        if checked >= 4:  # 2 Hindi + 2 Gujarati is enough per-test runtime
            break
    assert checked == 4
