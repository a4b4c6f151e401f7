"""Fallback-tier routing and merge (SURVEY J6/J7 — the reference's VLM
fallback retargeted to a second deterministic heuristic tier).

Routing (vlm_fallback.py:410-438): a result row goes to the fallback branch
iff overall confidence < 0.7 OR >= 2 critical fields are missing. The two
branches reunite with unionByName — predicate routing, no join needed.

Merge (vlm_fallback.py:441-507): full-outer-join per (url, field);
  - primary missing       -> take fallback value at 0.9x its confidence
  - both present + agree  -> primary value, confidence x1.25 capped at 0.95
  - both present + differ -> keep the higher-confidence side
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FALLBACK_CONF_THRESHOLD = 0.7
AGREE_BOOST, AGREE_CAP = 1.25, 0.95
FALLBACK_DISCOUNT = 0.9


def needs_fallback(results: DataFrame) -> DataFrame:
    """J7 routing predicate over the results schema."""
    n_missing = sum(
        F.when(F.col(c).isNull(), 1).otherwise(0)
        for c in ("title", "byline", "pub_date")
    ) + F.when(F.length("body_text") == 0, 1).otherwise(0)
    return results.withColumn(
        "use_fallback",
        (F.col("overall_confidence") < FALLBACK_CONF_THRESHOLD)
        | (n_missing >= 2),
    )


def merge_field(primary_val, primary_conf, fb_val, fb_conf):
    """J6 merge expression for one field; returns (value, confidence)."""
    agree = F.lower(F.trim(primary_val)) == F.lower(F.trim(fb_val))
    value = (
        F.when(primary_val.isNull(), fb_val)
        .when(fb_val.isNull(), primary_val)
        .when(agree, primary_val)
        .when(fb_conf > primary_conf, fb_val)
        .otherwise(primary_val)
    )
    conf = (
        F.when(primary_val.isNull(), F.round(fb_conf * FALLBACK_DISCOUNT, 4))
        .when(fb_val.isNull(), primary_conf)
        .when(agree, F.least(F.round(primary_conf * AGREE_BOOST, 4),
                             F.lit(AGREE_CAP)))
        .otherwise(F.greatest(primary_conf, fb_conf))
    )
    return value, conf


def merge_results(primary: DataFrame, fallback: DataFrame,
                  fields=("title", "byline", "pub_date")) -> DataFrame:
    """Full-outer merge of two extractor tiers on url."""
    fb = fallback.select(
        "url", *[F.col(f).alias(f"fb_{f}") for f in fields],
        *[F.col(f"{c}_conf").alias(f"fb_{c}_conf")
          for c in ("title", "byline", "date")],
    )
    j = primary.join(fb, "url", "full_outer")
    conf_col = {"title": "title_conf", "byline": "byline_conf",
                "pub_date": "date_conf"}
    out = j
    for f in fields:
        cc = conf_col[f]
        v, c = merge_field(F.col(f), F.col(cc),
                           F.col(f"fb_{f}"), F.col(f"fb_{cc}"))
        out = out.withColumn(f"merged_{f}", v).withColumn(f"merged_{cc}", c)
    return out.select(
        "url",
        *[F.col(f"merged_{f}").alias(f) for f in fields],
        *[F.col(f"merged_{conf_col[f]}").alias(conf_col[f]) for f in fields],
    )
