"""Timestamp utilities.

Parquet written elsewhere may carry TIMESTAMP_NTZ, which Spark 4 refuses to
cast straight to bigint. Casting through TIMESTAMP first (session tz is
pinned to UTC in session.py) is deterministic for both flavors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")
