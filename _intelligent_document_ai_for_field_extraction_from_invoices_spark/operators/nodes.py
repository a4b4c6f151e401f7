"""Relational twin of the extraction pipeline (SURVEY §7.1 M3).

The byte-exact path (operators/extract.py) keeps everything inside one Arrow
UDF. This module exposes the SAME semantics as a composable relational plan —
tokenize -> explode node stream -> enrich with native expressions -> field
candidates -> window argmax -> assembly — so every stage is Catalyst-visible
(pushdown, codegen, AQE) and DuckDB-checkable. Used for reporting/eval jobs;
parity with golden is pytest-asserted.

Node stream schema: FIXTURES.md §2 (the analogue of OCR token rows,
ocr.py:283-298). Page-level metadata (meta tags, <title>, <time datetime>)
rides along as pseudo-nodes with reserved tags (_meta/_title/_time) so one
UDF pass yields everything; real nodes have node_idx >= 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import golden

NODES_SCHEMA = (
    "url string, node_idx int, tag string, text string, depth int, "
    "char_off long, n_chars int, n_link_chars int, class_id string, "
    "boiler boolean, meta_block boolean"
)


def tokenize_nodes(pages: DataFrame) -> DataFrame:
    """HTML bytes -> node stream rows (the non-PDF branch). Arrow-batched;
    one output row per DOM block node plus pseudo-nodes for page metadata."""
    import pandas as pd  # noqa: PLC0415

    def run(batches):
        for pdf in batches:
            out = []
            for url, html in zip(pdf["url"], pdf["html"]):
                if html is None or len(html) == 0 \
                        or len(html) > golden.MAX_HTML_BYTES \
                        or html[:5] == b"%PDF-":
                    continue
                try:
                    parsed = golden.tokenize_html(golden.decode_html(html))
                except Exception:  # noqa: BLE001 — containment
                    continue
                for n in parsed.nodes:
                    out.append((url, n["node_idx"], n["tag"], n["text"],
                                n["depth"], n["char_off"], n["n_chars"],
                                n["n_link_chars"], n["class_id"], n["boiler"],
                                n["meta_block"]))
                for i, (name, content) in enumerate(parsed.metas):
                    # node_idx = occurrence order: golden._meta_get takes the
                    # FIRST non-blank meta per key, so the stream must keep it
                    out.append((url, i, "_meta", content, 0, -1,
                                len(content), 0, name, False, False))
                t = golden._norm_ws("".join(parsed.title_parts))
                if t:
                    out.append((url, -1, "_title", t, 0, -1, len(t), 0, "",
                                False, False))
                for i, ts in enumerate(parsed.time_attrs[:3]):
                    out.append((url, i, "_time", ts, 0, -1, len(ts), 0, "",
                                False, False))
            yield pd.DataFrame(out, columns=[
                "url", "node_idx", "tag", "text", "depth", "char_off",
                "n_chars", "n_link_chars", "class_id", "boiler", "meta_block",
            ])

    return pages.select("url", "html").mapInPandas(run, schema=NODES_SCHEMA)


# ---------------------------------------------------------------------------
# Native enrichment (SURVEY P1-P10: projections over the exploded stream)
# ---------------------------------------------------------------------------

def _is_real_node():
    """Real DOM nodes vs the _meta/_title/_time pseudo-nodes."""
    return (F.col("node_idx") >= 0) & ~F.col("tag").startswith("_")

def enrich_nodes(nodes: DataFrame) -> DataFrame:
    """Block feature projection — all whole-stage-codegen expressions:
    link density, block score (mirrors golden.block_score), keep flag."""
    n_chars = F.col("n_chars")
    link_density = F.when(n_chars > 0,
                          F.col("n_link_chars") / n_chars).otherwise(F.lit(1.0))
    base = F.coalesce(
        *[F.when(F.col("tag") == t, F.lit(s))
          for t, s in golden._TAG_BASE_SCORE.items()],
        F.lit(0.5),
    )
    score = F.round(base * (F.lit(1.0) - link_density)
                    * F.least(F.lit(1.0), n_chars / F.lit(80.0)), 4)
    keep = (
        (~F.col("boiler")) & (~F.col("meta_block"))
        & F.col("tag").isin(*sorted(golden.BODY_TAGS))
        & (n_chars >= golden.MIN_BODY_CHARS)
        & (3 * F.col("n_link_chars") <= n_chars)
        & (score >= golden.MIN_BODY_SCORE)
    )
    return nodes.filter(_is_real_node()).withColumns(
        {"link_density": F.round(link_density, 4), "score": score,
         "keep_body": keep}
    )


def assemble_body_native(nodes: DataFrame) -> DataFrame:
    """W2 retarget: ordered collect + array_join with the exact '\\n'
    separator discipline of golden.assemble_body, INCLUDING its tier-2
    fallback (non-boiler/non-meta/non-heading nodes >= FALLBACK_MIN_CHARS at
    fixed conf FALLBACK_BODY_CONF when the density classifier keeps nothing).

    Single-pass plan: one groupBy(url) collects the union of tier-1 and
    tier-2 candidate nodes (bounded per page), then array filters pick the
    tier — no second aggregation or anti-join. Urls with no candidate in
    either tier emit no row (golden returns an empty body for those)."""
    enriched = enrich_nodes(nodes)
    fb_ok = (
        (~F.col("boiler")) & (~F.col("meta_block"))
        & ~F.col("tag").isin("h1", "h2", "h3", "h4", "h5", "h6")
        & (F.col("n_chars") >= golden.FALLBACK_MIN_CHARS)
    )
    cand = enriched.withColumn("fb_ok", fb_ok).filter(
        F.col("keep_body") | F.col("fb_ok"))
    agg = cand.groupBy("url").agg(
        F.array_sort(F.collect_list(F.struct(
            "node_idx", "text", "score", "char_off", "keep_body", "fb_ok",
        ))).alias("ns")
    )
    kept = F.filter("ns", lambda s: s["keep_body"])
    fb = F.filter("ns", lambda s: s["fb_ok"])
    chosen = F.when(F.size(kept) > 0, kept).otherwise(fb)
    conf = F.when(
        F.size(kept) > 0,
        F.round(
            F.aggregate(kept, F.lit(0.0), lambda a, s: a + s["score"])
            / F.size(kept), 4),
    ).otherwise(F.lit(golden.FALLBACK_BODY_CONF))
    return (
        agg.select(
            "url",
            F.array_join(F.transform(chosen, lambda s: s["text"]), "\n")
            .alias("body_text"),
            F.size(chosen).cast("long").alias("n_blocks_kept"),
            conf.alias("body_conf_raw"),
            F.element_at(chosen, 1)["char_off"].alias("body_span_start"),
        )
        .withColumn("body_span_len", F.length("body_text"))
    )


# ---------------------------------------------------------------------------
# Native field candidates + deterministic window argmax (F1-F3 + A1)
# ---------------------------------------------------------------------------

def _month_map():
    # built lazily: Column literals need an active SparkContext
    return F.create_map(*[
        F.lit(x) for kv in golden._MONTHS.items() for x in kv
    ])

# reuse golden's compiled pattern text so the banks cannot drift between
# the twins — same discipline as _CANON_STEPS. The strings are ASCII-pinned
# in golden ([0-9], explicit whitespace class, ASCII lookarounds) precisely
# so they compile to the same automaton under Python re AND Java regex.
_ISO = golden._DATE_ISO_RE.pattern
_TEXTUAL = golden._DATE_TEXT_RE.pattern
_TEXTUAL_ML = golden._DATE_TEXT_ML_RE.pattern


def _ml_month_map():
    return F.create_map(*[
        F.lit(x) for kv in golden._MONTHS_ML.items() for x in kv
    ])


def _norm_date_native(raw):
    """ISO, 'Month D, YYYY', or Hindi/Gujarati 'D <month> YYYY' ->
    'YYYY-MM-DD' with the P7 year-range guard (mirrors golden's bank order:
    ISO, English textual, ML textual)."""
    # golden's ISO pattern captures (year)(month)(day) as three groups
    iso_y = F.regexp_extract(raw, _ISO, 1)
    iso = F.when(iso_y != "", F.concat_ws(
        "-", iso_y, F.regexp_extract(raw, _ISO, 2),
        F.regexp_extract(raw, _ISO, 3))).otherwise(F.lit(""))
    mon = F.regexp_extract(raw, _TEXTUAL, 1)
    day = F.regexp_extract(raw, _TEXTUAL, 2)
    yr = F.regexp_extract(raw, _TEXTUAL, 3)
    textual = F.when(
        mon != "",
        F.concat_ws("-", yr, F.lpad(F.element_at(_month_map(), F.lower(mon))
                                    .cast("string"), 2, "0"),
                    F.lpad(day, 2, "0")),
    )
    mon_ml = F.regexp_extract(raw, _TEXTUAL_ML, 2)
    textual_ml = F.when(
        mon_ml != "",
        F.concat_ws(
            "-", F.regexp_extract(raw, _TEXTUAL_ML, 3),
            F.lpad(F.element_at(_ml_month_map(), mon_ml).cast("string"),
                   2, "0"),
            F.lpad(F.regexp_extract(raw, _TEXTUAL_ML, 1), 2, "0")),
    )
    d = F.when(iso != "", iso).otherwise(
        F.when(mon != "", textual).otherwise(textual_ml))
    year_ok = F.substring(d, 1, 4).cast("int").between(1990, 2030)
    month_ok = F.substring(d, 6, 2).cast("int").between(1, 12)
    day_ok = F.substring(d, 9, 2).cast("int").between(1, 31)
    return F.when(d.isNotNull() & year_ok & month_ok & day_ok, d)


def _valid_byline_native(v):
    digits = F.length(F.regexp_replace(v, r"[^0-9]", ""))
    # all-lower rejection applies only to caseable scripts (golden parity:
    # Devanagari/Gujarati have lower == upper and must pass)
    return (
        F.length(v).between(3, 80)
        & ((v != F.lower(v)) | (F.lower(v) == F.upper(v)))
        & (~F.lower(F.trim(v)).isin([*golden._BYLINE_REJECT]))
        & (digits <= 0.3 * F.length(v))
    )


def field_candidates(nodes: DataFrame) -> DataFrame:
    """Candidates table (FIXTURES.md §3): (url, field, value, score, source,
    node_idx, source_rank). source_rank encodes golden's insertion order so
    the argmax tie-break reproduces first-wins semantics exactly."""
    metas = nodes.filter(F.col("tag") == "_meta")
    titles = nodes.filter(F.col("tag") == "_title")
    times = nodes.filter(F.col("tag") == "_time")
    real = nodes.filter(_is_real_node())

    def first_meta(*keys: str) -> DataFrame:
        """golden._meta_get twin: the first NON-BLANK meta of the highest-
        priority key present — exactly one row per url (key priority first,
        then meta occurrence order). Validity filters apply to that one row
        afterwards, as in golden (an invalid winner yields NO candidate, it
        does not fall through to a lower-priority meta)."""
        key_rank = F.coalesce(*[
            F.when(F.col("class_id") == k, F.lit(i)) for i, k in enumerate(keys)
        ])
        w = Window.partitionBy("url").orderBy("key_rank", "node_idx")
        return (
            metas.filter(F.col("class_id").isin(*keys)
                         & (F.trim("text") != ""))
            .withColumn("key_rank", key_rank)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("key_rank", "_rn")
        )

    def cand(df, field, value, score, source, rank, node_idx=F.lit(-1)):
        return df.select(
            "url", F.lit(field).alias("field"), value.alias("value"),
            F.lit(score).alias("score"), F.lit(source).alias("source"),
            node_idx.cast("int").alias("node_idx"),
            F.lit(rank).alias("source_rank"),
        ).filter(F.col("value").isNotNull())

    # golden.WS_NORM_PATTERN: Python's Unicode \s as an explicit class —
    # Java's bare \s is ASCII-only, so 'March\xa05' would normalize in
    # golden but not here
    t = F.trim(F.regexp_replace(F.col("text"), golden.WS_NORM_PATTERN, " "))
    valid_title = F.length(t).between(3, 300)

    title_cands = [
        cand(first_meta("og:title").filter(valid_title),
             "title", t, 0.95, "meta_og", 0),
        cand(first_meta("twitter:title").filter(valid_title),
             "title", t, 0.85, "meta_twitter", 1),
        cand(
            real.filter((F.col("tag") == "h1") & ~F.col("boiler")
                        & F.length("text").between(3, 300))
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("url").orderBy("node_idx")))
            .filter(F.col("rn") == 1),
            "title", F.col("text"), 0.9, "h1", 2, F.col("node_idx")),
        cand(titles.filter(valid_title), "title", t, 0.8, "title_tag", 3),
    ]

    by_meta = first_meta("author", "article:author", "parsely-author").filter(
        _valid_byline_native(t)
    )
    by_rx = golden._BYLINE_TEXT_RE.pattern  # shared source of truth
    by_rx_ml = golden._BYLINE_ML_RE.pattern
    by_text = (
        real.filter((F.col("node_idx") < 25) & ~F.col("boiler"))
        .withColumn("m_en", F.regexp_extract("text", by_rx, 1))
        .withColumn("m", F.when(F.col("m_en") != "", F.col("m_en"))
                    .otherwise(F.regexp_extract("text", by_rx_ml, 1)))
        .filter((F.col("m") != "") & _valid_byline_native(F.col("m")))
        .withColumn("s", F.when(F.col("node_idx") < 5,
                                F.round(F.lit(0.7 * 1.12), 4))
                    .otherwise(F.lit(0.7)))
    )
    byline_cands = [
        cand(by_meta, "byline", t, 0.9, "meta_author", 0),
        by_text.select(
            "url", F.lit("byline").alias("field"), F.col("m").alias("value"),
            F.col("s").alias("score"), F.lit("by_pattern").alias("source"),
            F.col("node_idx").cast("int").alias("node_idx"),
            F.lit(1).alias("source_rank"),
        ),
    ]

    date_cands = [
        cand(times, "pub_date", _norm_date_native(F.col("text")), 0.95,
             "time_attr", 0, F.col("node_idx")),
        cand(first_meta("article:published_time", "date", "dc.date",
                        "datepublished", "pubdate"),
             "pub_date", _norm_date_native(F.col("text")), 0.9, "meta_date", 1),
        cand(real.filter((F.col("node_idx") < 15) & ~F.col("boiler")),
             "pub_date", _norm_date_native(F.col("text")), 0.6, "text_date", 2,
             F.col("node_idx")),
    ]

    out = title_cands[0]
    for c in title_cands[1:] + byline_cands + date_cands:
        out = out.unionByName(c)
    return out


def best_fields(nodes: DataFrame) -> DataFrame:
    """Deterministic argmax per (url, field) — A1 with explicit tie-breaks —
    pivoted to one row per url."""
    cands = field_candidates(nodes)
    w = Window.partitionBy("url", "field").orderBy(
        F.desc("score"), F.asc("source_rank"), F.asc("node_idx")
    )
    best = cands.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.groupBy("url")
        .pivot("field", ["title", "byline", "pub_date"])
        .agg(F.first("value"))
    )
