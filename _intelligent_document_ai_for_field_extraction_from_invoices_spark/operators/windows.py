"""Ordered/window operators over the node stream (SURVEY J4, W3, W6).

J4 — adjacent-pair merge: the reference combines block i with block i+1 when
both look like name fragments (extractor.py:273-292, multiline company
names). Retarget: merge split headline nodes via a window `lead` — no
shuffle-join, one window over (url, node_idx).

W3 — section-window lookahead: first block matching a keyword starts a
section; the following k blocks are its context (extractor.py:564-570).
Window-min + range predicate.

W6 — greedy overlap suppression (NMS, detector.py:270-316): inherently
sequential per group, groups are tiny -> applyInPandas per url, never a
distributed window.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_adjacent_pairs(nodes: DataFrame,
                         max_each_chars: int = 80) -> DataFrame:
    """J4: candidate merged headlines — node i + node i+1 when both are
    short, start uppercase, and contain no digits (the reference's
    multiline-name heuristic verbatim, retargeted)."""
    w = Window.partitionBy("url").orderBy("node_idx")
    nxt_text = F.lead("text").over(w)
    nxt_idx = F.lead("node_idx").over(w)
    looks_fragment = (
        (F.length("text") <= max_each_chars)
        & F.col("text").rlike(r"^[A-Z]")
        & ~F.col("text").rlike(r"[0-9]")
    )
    nxt_fragment = (
        (F.length(nxt_text) <= max_each_chars)
        & nxt_text.rlike(r"^[A-Z]")
        & ~nxt_text.rlike(r"[0-9]")
        & (nxt_idx == F.col("node_idx") + 1)
    )
    return (
        nodes.withColumn("next_text", nxt_text)
        .withColumn("is_pair", looks_fragment & nxt_fragment)
        .filter(F.col("is_pair"))
        .select(
            "url", "node_idx",
            F.concat_ws(" ", "text", "next_text").alias("merged_text"),
        )
    )


def section_window(nodes: DataFrame, keyword: str, k: int,
                   text_col: str = "text") -> DataFrame:
    """W3: all blocks within k positions after the first block containing
    `keyword` (case-insensitive), per url."""
    hit = F.when(F.lower(F.col(text_col)).contains(keyword.lower()),
                 F.col("node_idx"))
    w = Window.partitionBy("url")
    start = F.min(hit).over(w)
    return (
        nodes.withColumn("section_start", start)
        .filter(
            F.col("section_start").isNotNull()
            & F.col("node_idx").between(F.col("section_start"),
                                        F.col("section_start") + k)
        )
        .drop("section_start")
    )


_NMS_SCHEMA = ("url string, span_start long, span_len long, score double")


def suppress_overlapping_spans(spans: DataFrame,
                               max_iou: float = 0.5) -> DataFrame:
    """W6: greedy NMS over char spans per url — sort by score desc, keep the
    head, drop spans whose interval-IoU with a kept span exceeds max_iou.
    Sequential per group by nature; grouped-map pandas, deterministic order
    (score desc, span_start asc)."""

    def nms(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["score", "span_start"],
                              ascending=[False, True], kind="mergesort")
        kept = []
        for row in pdf.itertuples(index=False):
            s1, e1 = row.span_start, row.span_start + row.span_len
            ok = True
            for k in kept:
                s2, e2 = k.span_start, k.span_start + k.span_len
                inter = max(0, min(e1, e2) - max(s1, s2))
                union = (e1 - s1) + (e2 - s2) - inter
                if union > 0 and inter / union > max_iou:
                    ok = False
                    break
            if ok:
                kept.append(row)
        return pd.DataFrame(kept, columns=pdf.columns)

    return spans.select("url", "span_start", "span_len", "score") \
        .groupBy("url").applyInPandas(nms, schema=_NMS_SCHEMA)


def span_iou(s1, l1, s2, l2):
    """F16/J5: interval IoU expression (the bbox-IoU analogue,
    detector.py:34-46) — pure native arithmetic."""
    e1, e2 = s1 + l1, s2 + l2
    inter = F.greatest(F.lit(0), F.least(e1, e2) - F.greatest(s1, s2))
    union = l1 + l2 - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
