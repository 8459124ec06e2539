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
    value_cols: list[str] | str,
    window_size: int,
    out_col: str = "window",
    num_partitions: int | None = None,
) -> DataFrame:
    """W1, overlap-partition path (scale strategy for large W).

    ``value_cols`` accepts a single name (window = array<scalar>, built as
    a zero-copy ``sliding_window_view``) or a list (window = array<struct>,
    same element shape as the other three W1 paths — multi-feature callers
    no longer have to fall back to the W×-amplifying collect_list path).

    Plan: range-repartition on (entity, ts) -> duplicate each row's
    (partition_id+1) copy iff it is within W-1 rows of its partition's tail
    -> sortWithinPartitions -> mapInPandas builds windows vectorized,
    emitting only rows owned by the partition (overlap rows contribute
    history but are not re-emitted). Avoids the W× row amplification that
    collect_list pushes through the shuffle.

    Entities are hash-partitioned whole and the partition is sorted on
    (entity, ts), so Arrow batches arrive entity-contiguous in time order.
    Each batch is processed with one ``sliding_window_view`` per entity run
    (zero-copy, no per-row Python); the trailing W-1 rows of the batch's
    LAST entity are carried into the next batch as context, so an entity
    spanning multiple Arrow batches (> maxRecordsPerBatch rows) loses no
    windows. Carried rows contribute history only — a window ending at a
    carried row needs W rows of context the carry cannot contain, so
    nothing is ever emitted twice (parity under a tiny batch size is
    tested). For entities too large for one partition use
    ``sliding_windows_chunked``.
    """
    import numpy as np
    from pyspark.sql import types as T

    cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    multi = len(cols) > 1
    elem_type = (
        T.StructType([df.schema[c] for c in cols])
        if multi
        else df.schema[cols[0]].dataType
    )
    schema = T.StructType(
        [
            df.schema[entity_col],
            df.schema[ts_col],
            T.StructField(out_col, T.ArrayType(elem_type), False),
        ]
    )
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    W = window_size

    # null-entity keys must behave exactly like sliding_windows
    # (Window.partitionBy keeps nulls as one group): pandas groupby defaults
    # to dropna=True and NaN == NaN is False, so both the grouping and the
    # carry comparison need isna-aware forms (same helpers as ema_macd)
    def _same(a, b):
        return (pd.isna(a) and pd.isna(b)) or a == b

    def _key_mask(col: pd.Series, key):
        return col.isna() if pd.isna(key) else (col == key)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None  # trailing rows of the last entity
        for pdf in batches:
            if pdf.empty:
                continue
            if carry is not None:
                # only prepend if the batch continues the carried entity;
                # otherwise that entity ended exactly at a batch boundary
                if _same(pdf[entity_col].iloc[0], carry[entity_col].iloc[0]):
                    pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            out_frames = []
            for _, g in pdf.groupby(entity_col, sort=False, dropna=False):
                n = len(g)
                if n >= W:
                    if multi:
                        # one dict per ROW (shared across the W windows that
                        # contain it), windows as O(1)-ish slices — no W×
                        # duplication of the feature values in Python
                        recs = g[cols].to_dict("records")
                        wins = [recs[i : i + W] for i in range(n - W + 1)]
                    else:
                        vals = g[cols[0]].to_numpy()
                        wins = list(
                            np.lib.stride_tricks.sliding_window_view(vals, W)
                        )
                    out_frames.append(
                        pd.DataFrame(
                            {
                                entity_col: g[entity_col].to_numpy()[W - 1 :],
                                ts_col: g[ts_col].to_numpy()[W - 1 :],
                                out_col: wins,
                            }
                        )
                    )
            # carry: up to W-1 trailing rows of the batch's last entity —
            # enough history for every yet-unseen row of that entity (rows
            # shorter than their full history keep ALL their rows via tail)
            last_ent = pdf[entity_col].iloc[-1]
            tail = pdf[_key_mask(pdf[entity_col], last_ent)].tail(W - 1)
            carry = tail if len(tail) else None
            if out_frames:
                yield pd.concat(out_frames, ignore_index=True)

    return (
        df.select(entity_col, ts_col, *cols)
        .repartition(n_parts, entity_col)
        .sortWithinPartitions(entity_col, ts_col)
        .mapInPandas(build, schema)
    )


def sliding_windows_chunked(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_cols: list[str],
    window_size: int,
    rows_per_chunk: int = 8192,
    out_col: str = "window",
    rn_ts_chunk_seconds: int | None = None,
) -> DataFrame:
    """W1 skew-proof path: split each entity into fixed-size row chunks,
    replicate exactly the last W-1 rows of each chunk into the next chunk as
    context, then build windows per (entity, chunk) partition.

    Why: the plain path partitions by entity, so a heavy-hitter entity
    (Zipf head) serializes into one task — at 10^12 rows a single doc_id can
    hold billions of rows. Here the only per-entity serial pass is a
    row_number (cheap sort, no array materialization); the expensive
    collect_list amplification runs on bounded (rows_per_chunk + W - 1)
    slices, parallel across chunks of the SAME entity.

    Output is identical to ``sliding_windows`` (verified in tests): context
    rows contribute history but are not re-emitted, and rows with fewer
    than W predecessors are dropped globally, not per chunk.
    """
    if rows_per_chunk < window_size:
        raise ValueError("rows_per_chunk must be >= window_size (context spans one chunk)")
    src = df.select(entity_col, ts_col, *value_cols)
    if rn_ts_chunk_seconds is None:
        w_rn = Window.partitionBy(entity_col).orderBy(ts_col)
        base = src.withColumn("__rn", F.row_number().over(w_rn) - 1)
    else:
        # two-level scan row_number: a heavy entity's global row_number is a
        # serial sort of ALL its rows in one task. Instead: local row_number
        # within (entity, time-chunk) [parallel] + cumulative chunk-count
        # offsets [one tiny scan over #chunks rows per entity].
        base = _scan_row_numbers(src, entity_col, ts_col, rn_ts_chunk_seconds)
    chunk = F.floor(F.col("__rn") / rows_per_chunk)
    # one pass, no union: every row emits its owned (chunk, ctx=false) copy,
    # and the last W-1 rows of each chunk also emit a (chunk+1, ctx=true)
    # context copy. A union of two branches would run the per-entity
    # row_number sort twice — with a heavy-hitter entity that doubles the
    # straggler task.
    assign = F.when(
        F.pmod(F.col("__rn"), F.lit(rows_per_chunk))
        >= rows_per_chunk - (window_size - 1),
        F.array(
            F.struct(chunk.alias("c"), F.lit(False).alias("ctx")),
            F.struct((chunk + 1).alias("c"), F.lit(True).alias("ctx")),
        ),
    ).otherwise(F.array(F.struct(chunk.alias("c"), F.lit(False).alias("ctx"))))
    both = (
        base.withColumn("__a", F.explode(assign))
        .withColumn("__chunk", F.col("__a.c"))
        .withColumn("__ctx", F.col("__a.ctx"))
        .drop("__a")
    )
    w_chunk = (
        Window.partitionBy(entity_col, "__chunk")
        .orderBy(ts_col)
        .rowsBetween(-(window_size - 1), 0)
    )
    payload = (
        F.struct(*[F.col(c) for c in value_cols])
        if len(value_cols) > 1
        else F.col(value_cols[0])
    )
    return (
        both.withColumn(out_col, F.collect_list(payload).over(w_chunk))
        .filter(~F.col("__ctx"))
        .filter(F.col("__rn") >= window_size - 1)  # global W-history rule
        .filter(F.size(out_col) == window_size)
        .select(entity_col, ts_col, out_col)
    )


def _scan_row_numbers(
    src: DataFrame, entity_col: str, ts_col: str, ts_chunk_seconds: int
) -> DataFrame:
    """Global per-entity 0-based __rn without a per-entity serial sort:
    row_number within (entity, time-chunk) + prefix-sum of chunk counts."""
    from feature_extractor_spark.functions.timeutil import epoch_seconds

    tchunk = F.floor(epoch_seconds(F.col(ts_col)) / F.lit(ts_chunk_seconds))
    marked = src.withColumn("__tc", tchunk)
    w_local = Window.partitionBy(entity_col, "__tc").orderBy(ts_col)
    local = marked.withColumn("__lrn", F.row_number().over(w_local) - 1)
    w_off = (
        Window.partitionBy(entity_col)
        .orderBy("__tc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        marked.groupBy(entity_col, "__tc")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)))
        .select(entity_col, "__tc", "__off")
    )
    return (
        local.join(offsets, [entity_col, "__tc"])
        .withColumn("__rn", (F.col("__lrn") + F.col("__off")).cast("long"))
        .drop("__tc", "__lrn", "__off")
    )


def sliding_windows_auto(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_cols: list[str],
    window_size: int,
    heavy_share: float = 0.02,
    rows_per_chunk: int = 8192,
    target_chunks: int = 128,
    out_col: str = "window",
    heavy_keys: list | None = None,
    ts_chunk_seconds: int | None = None,
) -> DataFrame:
    """Skew-adaptive window build (production default at scale): the plain
    per-entity path for the key population (parallel across keys), the
    chunked path with scan-based row numbers for detected heavy hitters.
    Same output as ``sliding_windows`` (tested).

    Pass ``heavy_keys`` (+ optional ``ts_chunk_seconds``) when known — the
    detection queries otherwise EXECUTE ``df``'s plan twice more, which is
    expensive when df is itself a join/window pipeline."""
    from feature_extractor_spark.functions.timeutil import epoch_seconds

    heavy = heavy_keys
    if heavy is None:
        sampled = df.select(entity_col).sample(fraction=0.1, seed=42)
        counts = sampled.groupBy(entity_col).count()
        total = counts.agg(F.sum("count")).first()[0] or 0
        heavy = (
            [r[0] for r in counts.filter(F.col("count") > heavy_share * total).collect()]
            if total
            else []
        )
    if not heavy:
        return sliding_windows(df, entity_col, ts_col, value_cols, window_size, out_col)
    d_heavy = df.filter(F.col(entity_col).isin(heavy))
    # isNull() branch: ~isin is NULL (not False) for NULL keys — without it
    # null-keyed rows vanish from both branches
    d_light = df.filter(F.col(entity_col).isNull() | ~F.col(entity_col).isin(heavy))
    ts_chunk = ts_chunk_seconds
    if ts_chunk is None:
        span = d_heavy.agg(
            epoch_seconds(F.min(ts_col)).alias("lo"),
            epoch_seconds(F.max(ts_col)).alias("hi"),
        ).first()
        ts_chunk = max(1, int((span["hi"] - span["lo"]) / target_chunks) + 1)
    light_out = sliding_windows(
        d_light, entity_col, ts_col, value_cols, window_size, out_col
    )
    heavy_out = sliding_windows_chunked(
        d_heavy,
        entity_col,
        ts_col,
        value_cols,
        window_size,
        rows_per_chunk=rows_per_chunk,
        out_col=out_col,
        rn_ts_chunk_seconds=ts_chunk,
    )
    return light_out.unionByName(heavy_out)


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
