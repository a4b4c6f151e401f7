"""Explicit skew handling (north rule: partitioning/shuffle/skew explicit).

Web pages cluster by host; a host-ordered or host-partitioned input feeds some
tasks 30% of all bytes. AQE cannot rebalance a skewed *UDF compute* stage
(it only splits shuffle reads for joins), so we pre-shuffle on a salted hash
of the url so every partition receives a uniform url mix — the distributed
analogue of the reference's uniform thread-pool dispatch
(executable.py:536-551)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 1469598103  # fixed: determinism across runs


def salted_repartition(df: DataFrame, num_partitions: int,
                       key: str = "url", salt: int = DEFAULT_SALT) -> DataFrame:
    """Hash-repartition on xxhash64(key, salt) — uniform over hosts, stable
    across runs (resume-safe: a row's partition id is a pure function of key)."""
    return df.repartition(
        num_partitions,
        F.pmod(F.xxhash64(F.col(key), F.lit(salt)), F.lit(num_partitions)),
    )
