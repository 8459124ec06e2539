"""Overlap-add window reconstruction (SURVEY.md §2.4 A7).

Reference (unwindow_data, /root/reference/app/reconstruction.py:4-56):
distribute each window value back to its absolute position, sum
contributions, divide by coverage count (ramp 1..W at the edges, W in the
middle). The reference does this with nested Python loops over rows×cols;
here it's ``posexplode`` + one aggregation — the coverage count falls out of
``count(*)`` naturally, and the whole thing is shuffle-once, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unwindow(
    df: DataFrame,
    entity_col: str,
    row_idx_col: str,
    window_col: str,
    out_col: str = "reconstructed",
) -> DataFrame:
    """``row_idx_col`` is the 0-based index of the window's FIRST element in
    the original sequence; window i covers absolute positions i..i+W-1."""
    exploded = df.select(
        entity_col,
        F.col(row_idx_col).alias("__win_start"),
        F.posexplode(F.col(window_col)).alias("__pos", "__val"),
    ).select(
        entity_col,
        (F.col("__win_start") + F.col("__pos")).alias("abs_pos"),
        F.col("__val"),
    )
    return (
        exploded.groupBy(entity_col, "abs_pos")
        .agg(
            (F.sum("__val") / F.count(F.lit(1))).alias(out_col),
            F.count(F.lit(1)).alias("coverage"),
        )
        .orderBy(entity_col, "abs_pos")
    )
