"""Driver-side evaluation report (ref evaluate.py:835-909 markdown report).

All heavy lifting happens in the distributed eval job (operators/evaluate.py);
this renders the collected aggregates — the only driver-side step, exactly as
SURVEY §3.3 prescribes."""

from __future__ import annotations

from pyspark.sql import DataFrame

from .operators import evaluate as ev


def render_eval_report(results: DataFrame, golden_df: DataFrame) -> str:
    joined = ev.joined_eval(results, golden_df)
    prf = ev.field_prf(joined).collect()
    acc = ev.document_accuracy(joined).first()
    dist = ev.confidence_distribution(results).first()
    errs = ev.error_breakdown(results).collect()

    lines = [
        "# Extraction evaluation report",
        "",
        "## Document-level accuracy",
        "",
        f"- documents evaluated: {acc.n_docs}",
        f"- fully correct: {acc.fully_correct} ({acc.doc_accuracy:.2%})",
        f"- partially correct (>=2/4 checks): {acc.partially_correct}",
        f"- **body byte-match rate: {acc.body_byte_match_rate:.2%}**"
        " (gate: 100%)",
        "",
        "## Per-field precision / recall / F1",
        "",
        "| field | tp | fp | fn | precision | recall | f1 |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in sorted(prf, key=lambda r: r.field):
        lines.append(
            f"| {r.field} | {r.tp} | {r.fp} | {r.fn} "
            f"| {r.precision} | {r.recall} | {r.f1} |"
        )
    lines += [
        "",
        "## Confidence distribution",
        "",
        f"- mean {dist.mean}, median {dist.median}, stdev {dist.stdev},"
        f" min {dist.min}, max {dist.max}",
        f"- tiers: high(>=.85) {dist.n_high} / medium {dist.n_medium}"
        f" / low(<.65) {dist.n_low}",
        "",
        "## Errors",
        "",
        "| category | n |",
        "|---|---|",
    ]
    for r in sorted(errs, key=lambda r: r.category):
        lines.append(f"| {r.category} | {r.n} |")
    return "\n".join(lines) + "\n"
