"""Broadcast dimension joins (SURVEY J2/J3 — the reference's master-data
fuzzy match and model->HP lookup, extractor.py:295-307 / validator.py:74-88,
retargeted to a site-master dimension over web hosts)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..datagen import HOSTS
from ..functions.text import token_sort_ratio

SITE_MASTER_SCHEMA = "host string, canonical_name string, expected_lang string"


def default_site_master(spark: SparkSession) -> DataFrame:
    rows = [
        (h, f"Example Site {i}", ["en", "de", "es", "zh"][i % 4])
        for i, h in enumerate(HOSTS)
    ]
    return spark.createDataFrame(rows, SITE_MASTER_SCHEMA)


def fuzzy_match_site(results: DataFrame, master: DataFrame,
                     name_col: str = "title",
                     threshold: float = 0.75) -> DataFrame:
    """J2: fuzzy-match an extracted name against a small broadcast master.

    Cross join vs the broadcast dim, token-sort-ratio scored (Arrow UDF, the
    reference's metric), keep the argmax per url above threshold and rescale
    the match confidence — mirrors extractor.py:295-307 (accept > 75, best
    match wins, deterministic tie-break on host)."""
    scored = (
        results.select("url", name_col)
        .filter(F.col(name_col).isNotNull())
        .crossJoin(F.broadcast(master))
        .withColumn("match_score",
                    token_sort_ratio(F.col(name_col), F.col("canonical_name")))
    )
    w = Window.partitionBy("url").orderBy(F.desc("match_score"), F.asc("host"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("match_score") >= threshold))
        .select("url", "host", "canonical_name", "match_score")
    )


def validate_expected_lang(results_with_lang: DataFrame,
                           master: DataFrame) -> DataFrame:
    """J3: host -> expected-language lookup via broadcast map join; exact key
    first, flag mismatches (the model->HP range-check analogue)."""
    host = F.regexp_extract("url", r"https?://([^/]+)/", 1)
    return (
        results_with_lang.withColumn("host", host)
        .join(F.broadcast(master), "host", "left")
        .withColumn(
            "lang_ok",
            F.when(F.col("expected_lang").isNull(), F.lit(None))
            .otherwise(F.col("lang") == F.col("expected_lang")),
        )
        .select("url", "host", "lang", "expected_lang", "lang_ok")
    )
