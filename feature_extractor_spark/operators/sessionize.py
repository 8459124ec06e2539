"""Gap-based sessionization (SURVEY.md §2.5 W6).

A new session starts whenever the gap to the previous event of the same
entity exceeds ``gap_seconds``; session_id is the running count of such
boundaries (cumulative sum of gap flags). Pure window expressions: one
shuffle on the entity key, both window passes share the same sort order so
Catalyst plans a single exchange+sort.

Reference basis: generate-mode gap stepping
(/root/reference/app/REFERENCE_Functionality.md:183-185); the operator
itself is a north-rule requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feature_extractor_spark.functions.timeutil import epoch_seconds


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((epoch_seconds(F.col(ts_col)) - epoch_seconds(prev_ts)) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    cum = Window.partitionBy(entity_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(session_col, F.sum(is_new).over(cum).cast("long"))


def session_bounds(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Aggregate sessions to (entity, session_id, start, end, n_events)."""
    s = sessionize(df, entity_col, ts_col, gap_seconds)
    return s.groupBy(entity_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
