"""Deterministic Common-Crawl-style page corpus per BASELINE.json input_hint.

Pages `(url, warc_ts, html:binary, text, lang)` are synthesised from the
driver's read-only `documents` table (`doc_id, text, lang, source, n_chars`)
with pure doc_id arithmetic — every generation rule here is mirrored in ANSI
SQL inside `__spark_entry__.oracle_sql()` so DuckDB can recompute the expected
extraction results independently.

Flavors (precedence order, mirrored in SQL CASE):
  - doc_id % 97 == 96  -> empty payload        (failed-row path, executable.py:383-407)
  - doc_id % 11 == 7   -> %PDF- payload        (layout-parse branch, ocr.py:420-487)
  - doc_id % 13 == 5   -> malformed tag soup   (lenient-recovery path)
  - doc_id % 17 == 3   -> multilingual chrome  (Hindi/Gujarati byline+date
                          labels, no author/date metas — exercises the ML
                          extractor banks, ref extractor.py:87,106-107)
  - otherwise          -> clean HTML article

Host distribution is Zipf-ish skewed (top host ~30% of pages) to exercise the
salted repartition (north rule: skew handled explicitly).
"""

from __future__ import annotations

import datetime as _dt

from . import golden

AUTHORS = [
    "Alice Zhang", "Rohan Mehta", "Carla Diaz", "Priya Patel",
    "Tom Okafor", "Mina Park", "Lukas Braun", "Sofia Rossi",
]
AUTHORS_HI = ["अर्जुन शर्मा", "प्रिया वर्मा", "रवि कुमार", "नेहा गुप्ता"]
AUTHORS_GU = ["અમિત પટેલ", "રીના શાહ", "કિરણ દેસાઈ", "મીરા જોશી"]
HOSTS = [f"h{i}.example.com" for i in range(16)]
EPOCH_DATE = _dt.date(2024, 1, 1)
EPOCH_TS = _dt.datetime(2025, 1, 1, 0, 0, 0)
CHUNK_WORDS = 12

_MONTH_NAMES = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]


def host_for(doc_id: int) -> str:
    """Skewed host assignment: m<30 -> h0 (30%), m<45 -> h1, m<55 -> h2,
    else spread over h3..h15. Mirrored in oracle SQL."""
    m = doc_id % 100
    if m < 30:
        return HOSTS[0]
    if m < 45:
        return HOSTS[1]
    if m < 55:
        return HOSTS[2]
    return HOSTS[3 + m % 13]


def url_for(doc_id: int) -> str:
    return f"https://{host_for(doc_id)}/doc-{doc_id}"


def flavor_for(doc_id: int) -> str:
    if doc_id % 97 == 96:
        return "empty"
    if doc_id % 11 == 7:
        return "pdf"
    if doc_id % 13 == 5:
        return "soup"
    if doc_id % 17 == 3:
        return "ml"
    return "clean"


def title_for(doc_id: int, words: list[str]) -> str:
    return f"Doc {doc_id}: " + " ".join(words[:6])


def author_for(doc_id: int) -> str:
    return AUTHORS[doc_id % len(AUTHORS)]


def ml_script_for(doc_id: int) -> str:
    return "hi" if doc_id % 2 == 0 else "gu"


def ml_author_for(doc_id: int) -> str:
    bank = AUTHORS_HI if ml_script_for(doc_id) == "hi" else AUTHORS_GU
    return bank[doc_id % len(bank)]


def date_for(doc_id: int) -> str:
    return (EPOCH_DATE + _dt.timedelta(days=doc_id % 365)).isoformat()


def warc_ts_for(doc_id: int) -> _dt.datetime:
    return EPOCH_TS + _dt.timedelta(minutes=doc_id)


def chunks_for(words: list[str]) -> list[str]:
    """Split into CHUNK_WORDS-word paragraphs; a short tail merges into the
    last full chunk so every paragraph passes the body keep-rule. A doc with
    fewer than CHUNK_WORDS words is a single paragraph."""
    n = max(1, len(words) // CHUNK_WORDS)
    out = []
    for i in range(n):
        lo = i * CHUNK_WORDS
        hi = (i + 1) * CHUNK_WORDS if i < n - 1 else len(words)
        out.append(" ".join(words[lo:hi]))
    return out


def expected_body(doc_id: int, text: str) -> str | None:
    """Golden body text per url — what the pipeline must reproduce bytewise."""
    if flavor_for(doc_id) == "empty":
        return None
    return "\n".join(chunks_for(text.split()))


def _date_text(doc_id: int) -> str:
    d = EPOCH_DATE + _dt.timedelta(days=doc_id % 365)
    return f"{_MONTH_NAMES[d.month - 1]} {d.day}, {d.year}"


def _date_text_ml(doc_id: int) -> str:
    d = EPOCH_DATE + _dt.timedelta(days=doc_id % 365)
    bank = (golden.MONTHS_HI if ml_script_for(doc_id) == "hi"
            else golden.MONTHS_GU)
    return f"{d.day} {bank[d.month - 1]} {d.year}"


def render_html(doc_id: int, text: str, lang: str) -> bytes:
    # html.escape everywhere document-derived strings are interpolated: the
    # tokenizer unescapes entities on parse, so extraction round-trips to the
    # original text even when a corpus contains & < > " (today's synthetic
    # corpora are markup-free, so this changes no byte of the golden outputs)
    from html import escape  # noqa: PLC0415

    words = text.split()
    title = escape(title_for(doc_id, words))
    date = date_for(doc_id)  # internal ISO string, never markup
    paras = chunks_for(words)
    flavor = flavor_for(doc_id)
    soup = flavor == "soup"
    ml = flavor == "ml"
    if ml:
        # Hindi/Gujarati chrome: author/date exist ONLY as labeled text in
        # the byline block (no author meta, no published_time meta, no
        # <time datetime>), so extraction must go through the multilingual
        # pattern banks (golden._BYLINE_ML_RE / _DATE_TEXT_ML_RE)
        label = "द्वारा" if ml_script_for(doc_id) == "hi" else "લેખક"
        author = escape(ml_author_for(doc_id))
        author_meta = ""
        date_meta = ""
        byline_div = (f'<div class="byline">{label} {author} &mdash; '
                      f'{_date_text_ml(doc_id)}</div>')
    else:
        author = escape(author_for(doc_id))
        author_meta = f'<meta name="author" content="{author}">\n'
        date_meta = (f'<meta property="article:published_time" '
                     f'content="{date}T08:30:00Z">\n')
        byline_div = (f'<div class="byline">By {author} &mdash; '
                      f'<time datetime="{date}">{_date_text(doc_id)}</time>'
                      f'</div>')
    para_html = []
    for i, p in enumerate(paras):
        para_html.append(f"<p>{escape(p, quote=False)}</p>")
        if soup and i % 3 == 1:
            # mild malformations our tokenizer recovers from deterministically
            para_html.append("</div><br><hr>")
    nav_links = "".join(
        f'<a href="/s{i}">Section {i}</a> ' for i in range(6)
    )
    body_doc = "\n".join(para_html)
    html = f"""<!DOCTYPE html>
<html lang="{lang}">
<head>
<meta charset="utf-8">
<title>{title} | Example Site</title>
<meta property="og:title" content="{title}">
{author_meta}{date_meta}<style>.x{{color:red}}</style>
<script>var t = "<p>not content</p>";</script>
</head>
<body>
<header class="masthead"><a href="/">Example Site</a></header>
<nav class="nav">{nav_links}</nav>
<!-- rendered page -->
<article>
<h1>{title}</h1>
{byline_div}
{body_doc}
</article>
<div class="sidebar"><a href="/a">Most read</a> <a href="/b">Trending now</a> today</div>
<div class="comments"><p>First comment here, totally unrelated text!</p></div>
<footer class="footer"><a href="/about">About</a> &copy; 2025 Example Site — all rights reserved</footer>
</body>
</html>"""
    return html.encode("utf-8")


def render_pdf(doc_id: int, text: str) -> bytes:
    """Minimal uncompressed-stream PDF so the layout-parse branch is exactly
    decodable without PDF libs (SURVEY §7.0). One Tj per line."""
    words = text.split()
    lines = [
        f"Title: {title_for(doc_id, words)}",
        f"By {author_for(doc_id)}",
        f"Date: {date_for(doc_id)}",
        *chunks_for(words),
    ]
    ops = "BT /F1 12 Tf 72 720 Td " + " T* ".join(
        f"({golden.pdf_escape(ln)}) Tj" for ln in lines
    ) + " ET"
    stream = ops.encode("utf-8")
    parts = [
        b"%PDF-1.4\n",
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
        b"4 0 obj << /Length " + str(len(stream)).encode() + b" >>\nstream\n",
        stream,
        b"\nendstream\nendobj\n",
        b"trailer << /Root 1 0 R >>\n%%EOF\n",
    ]
    return b"".join(parts)


def render_page(doc_id: int, text: str, lang: str) -> bytes:
    f = flavor_for(doc_id)
    if f == "empty":
        return b""
    if f == "pdf":
        return render_pdf(doc_id, text)
    return render_html(doc_id, text, lang)


# ---------------------------------------------------------------------------
# Spark-side distributed generation (mapInPandas over the documents table)
# ---------------------------------------------------------------------------

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_from_documents(documents_df):
    """documents(doc_id,text,lang,...) -> pages(url,warc_ts,html,text,lang).

    Runs distributed via mapInPandas (Arrow batches; the per-doc template fill
    is the batched inner loop). Deterministic: pure doc_id arithmetic."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            texts = pdf["text"].tolist()
            langs = pdf["lang"].tolist()
            yield pd.DataFrame(
                {
                    "url": [url_for(i) for i in ids],
                    "warc_ts": [warc_ts_for(i) for i in ids],
                    "html": [render_page(i, t, lg) for i, t, lg in
                             zip(ids, texts, langs)],
                    "text": [" ".join(t.split()) for t in texts],
                    "lang": langs,
                }
            )

    # The sandbox documents table is a single parquet file = ONE partition;
    # without this repartition the generation AND the downstream salted
    # shuffle's map side run single-threaded and cap throughput at ~1/8 of
    # the machine (measured). A balanced shuffle of the small text table is
    # cheap and makes the whole pipeline scale with cores.
    par = documents_df.sparkSession.sparkContext.defaultParallelism * 2
    return (
        documents_df.select("doc_id", "text", "lang")
        .repartition(par, "doc_id")
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )
