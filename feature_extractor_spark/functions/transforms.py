"""Row-level transforms (SURVEY.md §2.2 P8).

``use_returns`` (reference /root/reference/app/config.py:88): convert a
price-like series to differences or relative returns — ``lag`` over the
entity window, one shuffle, codegen'd arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def returns(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    kind: str = "diff",
    out_col: str | None = None,
) -> DataFrame:
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    prev = F.lag(F.col(value_col)).over(w)
    if kind == "diff":
        expr = F.col(value_col) - prev
    elif kind == "pct":
        expr = F.col(value_col) / prev - 1.0
    elif kind == "log":
        expr = F.log(F.col(value_col)) - F.log(prev)
    else:
        raise ValueError(f"unknown kind {kind!r}")
    return df.withColumn(out_col or f"{value_col}_{kind}", expr)
