"""As-of (point-in-time) join with LOCF backfill (SURVEY.md §2.3 J3).

The reference's alignment is positional/temporal (window ends at the labeled
step, /root/reference/app/data_processor.py:18-38 + :102); the engine makes
it an explicit operator: for every left row (key, ts) attach the most recent
right row with right.ts <= left.ts (backward direction / last observation
carried forward). Zero temporal leakage by construction — rows with
right.ts > left.ts can never influence the output.

Two strategies:

- ``union_locf`` (default): union(left-probe, right-state) tagged, one
  window pass ``last(value, ignorenulls=True) over (partition by key
  order by ts, side)``. One shuffle on the key, no join at all — Catalyst
  plans a single sort + window; AQE handles partition sizing. Works for any
  key cardinality and is the 100 TB-safe default (sort-merge-shaped).

- ``merge_asof``: co-partition both sides by key, per-partition
  ``pandas.merge_asof`` inside mapInPandas via cogroup. Faster when the
  right side is wide (many value columns) because it avoids widening the
  union; Arrow-batched, no per-row Python.

A tolerance (max staleness) is supported in both.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feature_extractor_spark.functions.timeutil import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    strategy: str = "union_locf",
) -> DataFrame:
    if direction != "backward":
        raise NotImplementedError("only backward (LOCF) as-of is supported")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]
    if strategy == "union_locf":
        return _asof_union_locf(left, right, on, by, value_cols, tolerance_seconds)
    if strategy == "merge_asof":
        return _asof_merge_asof(left, right, on, by, value_cols, tolerance_seconds)
    raise ValueError(f"unknown strategy {strategy!r}")


def _asof_union_locf(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    tolerance_seconds: int | None,
) -> DataFrame:
    left_cols = left.columns
    # side=0 sorts right-side state BEFORE left probes at equal ts, so an
    # exact-ts right row is visible to the left row at the same instant
    # (merge_asof backward semantics: <=, not <).
    l_tagged = left.select(
        *left_cols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[on].dataType).alias("__r_ts"),
    )
    r_tagged = right.select(
        F.col(by),
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in (by, on)],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(on).alias("__r_ts"),
    ).select(*l_tagged.columns)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l_tagged.unionByName(r_tagged)
    out_vals = []
    carried_ts = F.last("__r_ts", ignorenulls=True).over(w)
    for c in value_cols:
        v = F.last(f"__r_{c}", ignorenulls=True).over(w)
        if tolerance_seconds is not None:
            fresh = (
                epoch_seconds(F.col(on)) - epoch_seconds(carried_ts)
            ) <= F.lit(tolerance_seconds)
            v = F.when(fresh, v)
        out_vals.append(v.alias(c))
    return (
        filled.select(*left_cols, F.col("__side"), *out_vals)
        .filter(F.col("__side") == 1)
        .drop("__side")
    )


def _asof_merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    tolerance_seconds: int | None,
) -> DataFrame:
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(left.schema.fields)
        + [T.StructField(c, right.schema[c].dataType, True) for c in value_cols]
    )
    tol = pd.Timedelta(seconds=tolerance_seconds) if tolerance_seconds else None

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if l_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        l_pdf = l_pdf.sort_values(on, kind="mergesort")
        if r_pdf.empty:
            for c in value_cols:
                l_pdf[c] = None
            return l_pdf
        r_pdf = r_pdf[[on] + value_cols].sort_values(on, kind="mergesort")
        return pd.merge_asof(
            l_pdf, r_pdf, on=on, direction="backward", tolerance=tol
        )

    return left.groupBy(by).cogroup(
        right.select(by, on, *value_cols).groupBy(by)
    ).applyInPandas(merge, out_schema)
