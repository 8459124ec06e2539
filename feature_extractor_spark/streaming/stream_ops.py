"""Structured Streaming variants of the batch operators (SURVEY.md §2.8).

The reference is batch-only; these exist so the same feature semantics run
over an unbounded source: gap-based sessionization via ``session_window``
(the streaming twin of operators/sessionize.py) and watermarked tumbling
window statistics. Both are plain readStream transformations — state
management, late-data handling and checkpointing come from the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_sessionize(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: session_window closes a session once no
    event arrives within the gap; the watermark bounds state. Emits one row
    per (entity, session) with bounds and event count — the streaming analog
    of operators/sessionize.session_bounds."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds"),
            F.col(entity_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            entity_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_windowed_stats(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregates per entity."""
    win = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win, F.col(entity_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("win_sum"),
            F.avg(value_col).alias("win_avg"),
        )
        .select(
            entity_col,
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "n_events",
            "win_sum",
            "win_avg",
        )
    )


def stream_ema(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    span: int = 20,
    timeout_minutes: int | None = 60,
) -> DataFrame:
    """Custom stateful streaming operator: per-entity EMA carried across
    micro-batches via ``applyInPandasWithState`` — the streaming twin of
    functions/indicators.ema_macd (same recursion y_t = (1-a) y_{t-1} +
    a x_t, a = 2/(span+1); parity vs pandas ewm(adjust=False) in tests).

    State per entity: (last_ema, last_ts). Rows inside a micro-batch are
    processed in ts order; state times out (and is dropped) after
    ``timeout_minutes`` of PROCESSING-time inactivity (wall-clock since the
    entity's last micro-batch — GroupStateTimeout.ProcessingTimeTimeout).
    Event-time expiry would need EventTimeTimeout plus a watermark on
    ``ts_col``; processing-time is the deliberate choice here so state GC
    does not depend on the event-time high-water mark advancing.

    ``timeout_minutes=None`` disables expiry (GroupStateTimeout.NoTimeout).
    Required for ``trigger(availableNow=True)`` runs: with
    ProcessingTimeTimeout the microbatch engine keeps scheduling batches to
    evaluate pending timeouts, so an available-now query NEVER terminates
    (measured: endless ~0.5s empty batches). Bounded replays/backfills use
    None; long-running streams keep a real timeout for state GC."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    alpha = 2.0 / (span + 1)
    out_schema = T.StructType(
        [
            T.StructField(entity_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField(f"ema_{span}", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("ema", T.DoubleType())])

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        ema = state.get[0] if state.exists else None
        frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            x = pdf[value_col].astype(float)
            # vectorized carry-in: prepending the carried EMA as a synthetic
            # first sample makes pandas ewm(adjust=False) reproduce the
            # recursion exactly (y_0 = carry); drop the synthetic row after
            if ema is not None:
                x = pd.concat([pd.Series([ema]), x], ignore_index=True)
            y = x.ewm(span=span, adjust=False).mean()
            emas = y.iloc[1:] if ema is not None else y
            ema = float(y.iloc[-1]) if len(y) else ema
            pdf = pdf[[entity_col, ts_col, value_col]].copy()
            pdf[f"ema_{span}"] = emas.to_numpy()
            frames.append(pdf)
        if ema is not None:
            state.update((float(ema),))
            if timeout_minutes is not None:
                state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield from frames

    conf = (
        GroupStateTimeout.NoTimeout
        if timeout_minutes is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy(entity_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=conf,
    )


def stream_windowed_encode(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    value_cols: list[str],
    window_size: int,
    weights: dict,
    timeout_minutes: int | None = 60,
) -> DataFrame:
    """Streaming twin of operators/fused.windowed_encode: per-entity
    stride-1 sliding windows + encoder forward over an unbounded source,
    carried across micro-batches via ``applyInPandasWithState``.

    State per entity: the trailing ``window_size - 1`` feature rows
    (flattened float list — bounded at (W-1)*F doubles regardless of stream
    length). Each arriving row is encoded as soon as W rows of history
    exist, producing exactly the batch path's latents (parity test:
    micro-batched stream == batch windowed_encode, allclose). Rows within a
    micro-batch are processed in event-time order; ACROSS micro-batches
    arrival order is trusted (same contract as stream_ema) — a late row
    older than already-consumed history is windowed against the history as
    carried, not retro-sorted. State expires after ``timeout_minutes`` of
    processing-time inactivity; ``timeout_minutes=None`` disables expiry —
    required for trigger(availableNow=True) runs, which never terminate
    under ProcessingTimeTimeout (see stream_ema).

    Scale shape: groupBy(entity) shuffles each row once; the encoder runs
    on Arrow batches inside the state function (no per-row Python beyond
    the pandas group loop the engine itself performs); weights ride the
    task closure once per executor.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    from feature_extractor_spark.encoder.forward import encoder_forward

    W = window_size
    nf = len(value_cols)
    ts_type = events.schema[ts_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(entity_col, T.StringType()),
            T.StructField(ts_col, ts_type),
            T.StructField("z_mean", T.ArrayType(T.FloatType())),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("hist", T.ArrayType(T.DoubleType()))]
    )

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        hist = (
            np.asarray(state.get[0], dtype=np.float32).reshape(-1, nf)
            if state.exists
            else np.zeros((0, nf), dtype=np.float32)
        )
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            vals = pdf[value_cols].to_numpy(dtype=np.float32)
            full = np.concatenate([hist, vals], axis=0)
            n_hist = len(full) - len(vals)
            # windows ending at each NEW row with >= W rows of history
            first_ok = max(W - 1, n_hist)  # global index of first encodable
            if len(full) >= W and first_ok < len(full):
                sw = np.lib.stride_tricks.sliding_window_view(
                    full, (W, nf)
                )[:, 0]  # (len(full)-W+1, W, nf)
                x = np.ascontiguousarray(sw[first_ok - (W - 1):])
                h = np.zeros((len(x), 0), dtype=np.float32)
                cond = np.zeros((len(x), 0), dtype=np.float32)
                z = encoder_forward(x, h, cond, weights)
                emit = pdf.iloc[first_ok - n_hist:]
                out = pd.DataFrame(
                    {
                        entity_col: emit[entity_col].to_numpy(),
                        ts_col: emit[ts_col].to_numpy(),
                        "z_mean": list(z),
                    }
                )
                yield out
            hist = full[-(W - 1):] if W > 1 else full[:0]
        state.update((hist.astype(np.float64).flatten().tolist(),))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)

    conf = (
        GroupStateTimeout.NoTimeout
        if timeout_minutes is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy(entity_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=conf,
    )
