"""Skew handling: salted repartition + heavy-hitter detection (SURVEY.md §4.2-6).

Heavy-hitter doc_ids (Zipf head) overload single tasks in groupBy/join.
Strategy:
- detection: sampled count per key (approximate, one cheap pass)
- salting: ``salt = pmod(hash(ts), K)`` appended to the key for heavy keys
  only, so light keys keep a 1-task group and heavy keys fan out K ways
- AQE skew-join splitting is enabled globally in session.py as the
  runtime backstop for joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold_share: float = 0.05,
    sample_fraction: float | None = 0.1,
) -> list[str]:
    """Keys holding more than ``threshold_share`` of (sampled) rows."""
    sampled = df.select(key_col)
    if sample_fraction is not None and sample_fraction < 1.0:
        sampled = sampled.sample(fraction=sample_fraction, seed=42)
    counts = sampled.groupBy(key_col).count()
    total = counts.agg(F.sum("count")).first()[0] or 0
    if total == 0:
        return []
    heavy = counts.filter(F.col("count") > threshold_share * total)
    return [r[key_col] for r in heavy.collect()]


def salted_repartition(
    df: DataFrame,
    key_col: str,
    salt_buckets: int = 16,
    heavy_keys: list[str] | None = None,
    salt_col: str = "__salt",
) -> DataFrame:
    """Append a salt column and repartition on (key, salt).

    If ``heavy_keys`` is given, only those keys are salted (light keys get
    salt 0 and stay single-task); otherwise every key is salted — use that
    for pure per-row map stages where grouping order doesn't matter.
    """
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    if heavy_keys is not None:
        salt = F.when(F.col(key_col).isin(heavy_keys), salt).otherwise(F.lit(0))
    return df.withColumn(salt_col, salt).repartition(F.col(key_col), F.col(salt_col))
