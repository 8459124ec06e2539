"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in feature_extractor_spark/plans/entry_queries.py;
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's encoder
    evaluation dataflow (SURVEY.md §3.2) — sliding windows -> cyclical
    conditions -> Arrow encoder forward -> latent vectors."""
    from feature_extractor_spark.plans import flagship_entry

    return flagship_entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from feature_extractor_spark.plans import ENTRY_QUERIES

    return dict(ENTRY_QUERIES)


def oracle_sql() -> dict[str, str]:
    from feature_extractor_spark.plans import ORACLE_SQL

    return dict(ORACLE_SQL)
