"""Corpus profiling: one-pass per-column statistics for pipeline ops.

Training-data pipelines need cheap dataset health checks (null surges,
length-distribution drift, cardinality blowups) before/after every
curation stage. ``profile_columns`` computes everything in ONE aggregate
job — a single scan with map-side partials, no per-column passes:

- all columns: null count + approx distinct (HLL, ``approx_count_distinct``)
- numeric: min / max / mean / approx p25/p50/p75/p99
  (``percentile_approx``, t-digest-style sketch — bounded memory at any
  row count)
- string: min/max/avg length
- array: min/max/avg size

Returns a LONG-format DataFrame (column, metric, value: double,
value_str) so downstream checks are joins, not schema surgery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PCTS = [0.25, 0.5, 0.75, 0.99]


def profile_columns(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Single-job profile of ``columns`` (default: all). One wide
    aggregate row is computed distributed, then unpivoted driver-side
    (constant-size: metrics x columns scalars)."""
    cols = columns if columns is not None else df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"))
        aggs.append(F.approx_count_distinct(c).alias(f"{c}__distinct"))
        if isinstance(dt, T.NumericType):
            aggs += [
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
                F.avg(c).alias(f"{c}__mean"),
                F.percentile_approx(
                    F.col(c).cast("double"), _PCTS, 10_000
                ).alias(f"{c}__pcts"),
            ]
        elif isinstance(dt, T.StringType):
            ln = F.length(c)
            aggs += [
                F.min(ln).cast("double").alias(f"{c}__min_len"),
                F.max(ln).cast("double").alias(f"{c}__max_len"),
                F.avg(ln).alias(f"{c}__avg_len"),
            ]
        elif isinstance(dt, T.ArrayType):
            sz = F.size(c)
            aggs += [
                F.min(sz).cast("double").alias(f"{c}__min_size"),
                F.max(sz).cast("double").alias(f"{c}__max_size"),
                F.avg(sz).alias(f"{c}__avg_size"),
            ]
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            aggs += [
                F.min(c).cast("string").alias(f"{c}__min_ts"),
                F.max(c).cast("string").alias(f"{c}__max_ts"),
            ]
    row = df.agg(*aggs).first().asDict()

    n_rows = int(row.pop("__n"))
    out_rows: list[tuple] = []
    for key, val in row.items():
        col, metric = key.split("__", 1)
        if metric == "pcts":
            if val is not None:
                for p, v in zip(_PCTS, val):
                    out_rows.append(
                        (col, f"p{int(p * 100)}", float(v), None)
                    )
            continue
        if metric in ("min_ts", "max_ts"):
            out_rows.append((col, metric, None, val))
            continue
        out_rows.append(
            (col, metric, None if val is None else float(val), None)
        )
    for c in cols:
        out_rows.append((c, "rows", float(n_rows), None))
    return df.sparkSession.createDataFrame(
        out_rows, "column string, metric string, value double, value_str string"
    )
