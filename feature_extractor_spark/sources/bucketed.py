"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Writing
both sides bucketed (and sorted) on the join key pre-partitions the data
ON DISK: Spark's scan reports the bucket spec as its output partitioning,
so a join of two tables bucketed the same way needs NO Exchange on either
side (and no Sort when sortBy matches). The price is paid once at write
time and amortized over every subsequent join/aggregate on that key —
exactly the right trade for a tokenized-sequence table that is written
once and joined constantly (tests/test_plan_quality.py pins the
no-Exchange plan).

Bucketing requires the table catalog (bucket metadata lives there, not in
the parquet footer), hence saveAsTable rather than a path write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table
    keyed on ``bucket_col``."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket spec comes from the catalog)."""
    return spark.table(table)
