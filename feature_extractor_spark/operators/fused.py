"""Fused window-build + encoder forward (the 100 TB path).

The declarative path (collect_list windows -> Arrow -> encoder UDF)
materializes every window as a W-element array: W× the data volume through
the JVM, the shuffle, and Arrow. At W=144 that is a 144× write
amplification of pure overhead — the reference pipeline's windows are
consumed by exactly one reader (the encoder).

This operator never materializes windows outside a NumPy view:

  raw rows -> scan-based per-entity row numbers (no serial pass)
           -> chunk assignment + W-1 context-row replication (explode)
           -> ONE shuffle of raw rows on (entity, chunk)
           -> applyInPandas per (entity, chunk):
                sort, np.sliding_window_view (zero-copy), encoder forward
                in sub-batches, emit (entity, ts, z_mean)

Parity vs the unfused path is allclose(rtol=1e-5) (tests); throughput and
scaling are the reason it exists (see BENCH.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_extractor_spark.encoder.forward import encoder_forward
from feature_extractor_spark.operators.windows import _scan_row_numbers


def _chunk_assign(
    src: DataFrame,
    entity_col: str,
    ts_col: str,
    W: int,
    rows_per_chunk: int,
    rn_ts_chunk_seconds: int,
) -> DataFrame:
    """Scan-based row numbers -> row-count chunks -> W-1 context rows
    replicated into the next chunk (single pass, explode)."""
    base = _scan_row_numbers(src, entity_col, ts_col, rn_ts_chunk_seconds)
    chunk = F.floor(F.col("__rn") / rows_per_chunk)
    assign = F.when(
        F.pmod(F.col("__rn"), F.lit(rows_per_chunk)) >= rows_per_chunk - (W - 1),
        F.array(
            F.struct(chunk.alias("c"), F.lit(False).alias("ctx")),
            F.struct((chunk + 1).alias("c"), F.lit(True).alias("ctx")),
        ),
    ).otherwise(F.array(F.struct(chunk.alias("c"), F.lit(False).alias("ctx"))))
    return (
        base.withColumn("__a", F.explode(assign))
        .withColumn("__chunk", F.col("__a.c"))
        .withColumn("__ctx", F.col("__a.ctx"))
        .drop("__a")
    )


def _cyclical_np(ts: pd.Series) -> np.ndarray:
    """The reference's 10 cyclical datetime features, vectorized in NumPy
    (matches functions/conditions.cyclical_datetime_features; parity in
    tests). Computing them here instead of as JVM columns removes 10 double
    columns from the shuffle and the Arrow transfer."""
    dt = ts.dt
    two_pi = np.float32(2 * np.pi)
    parts = [
        (dt.hour.to_numpy(), 24.0),
        (dt.weekday.to_numpy(), 7.0),  # pandas: Monday=0 (reference formula)
        (dt.day.to_numpy(), 31.0),
        (dt.month.to_numpy(), 12.0),
        (dt.dayofyear.to_numpy(), 366.0),
    ]
    cols = []
    for vals, period in parts:
        ang = two_pi * vals.astype(np.float32) / np.float32(period)
        cols.append(np.sin(ang))
        cols.append(np.cos(ang))
    return np.stack(cols, axis=1)


def windowed_encode(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    feature_cols: list[str],
    cond_cols: list[str] | None,
    window_size: int,
    weights: dict[str, np.ndarray],
    h_dim: int = 4,
    rows_per_chunk: int = 8192,
    rn_ts_chunk_seconds: int = 6 * 3600,
    sub_batch: int = 128,
    out_col: str = "z_mean",
    heavy_keys: list | None = None,
    plugin: str | None = None,
) -> DataFrame:
    """df must carry entity, ts, feature_cols (doubles) and cond_cols
    (doubles, point-in-time conditioning at the window's right edge).
    ``cond_cols=None`` computes the reference's 10 cyclical datetime
    features from ts inside the stage (cheaper: nothing extra shuffled).
    Returns (entity, ts, out_col).

    ``sub_batch`` bounds the kernel working set. With the output-pruned
    attention (scores are (B, 2, W), not (B, W, W)) the set is GEMM-stream
    friendly and 128 is the measured sweet spot: 618k windows/s at 32
    procs vs 316k at sub=32 (tiny GEMMs) and flat beyond 128.

    ``heavy_keys``: when given, ONLY those entities take the chunked path
    (scan row numbers + context replication + (entity, chunk) shuffle);
    everything else groups whole entities in one exchange with no row
    numbering at all — the chunked machinery exists for entities too big
    for one task, which by definition is just the Zipf head."""
    W = window_size
    if rows_per_chunk < W:
        raise ValueError("rows_per_chunk must be >= window_size")
    if plugin is not None:
        from feature_extractor_spark.encoder.plugins import get_encoder

        forward_fn = get_encoder(plugin)[1]
    else:
        forward_fn = encoder_forward

    in_stage_conds = cond_cols is None
    src = df.select(entity_col, ts_col, *feature_cols, *(cond_cols or []))

    def _whole_entity(df_):
        return df_.select(
            "*",
            F.lit(0).cast("long").alias("__rn"),
            F.lit(0).cast("long").alias("__chunk"),
            F.lit(False).alias("__ctx"),
            F.lit(True).alias("__local"),
        )

    if heavy_keys is not None and not heavy_keys:
        # detection ran and found nothing: pure whole-entity path — no
        # union with an empty chunk-assign branch (its row-number windows,
        # groupBy and join add ~8 empty stages of pure scheduling latency)
        both = _whole_entity(src)
    elif heavy_keys is not None:
        # isNull() branch: ~isin is NULL for NULL entity keys, which would
        # silently drop them from both branches
        light = _whole_entity(
            src.filter(
                F.col(entity_col).isNull() | ~F.col(entity_col).isin(heavy_keys)
            )
        )
        heavy_src = src.filter(F.col(entity_col).isin(heavy_keys))
        heavy = _chunk_assign(heavy_src, entity_col, ts_col, W, rows_per_chunk,
                              rn_ts_chunk_seconds).withColumn("__local", F.lit(False))
        both = light.unionByName(heavy)
    else:
        both = _chunk_assign(src, entity_col, ts_col, W, rows_per_chunk,
                             rn_ts_chunk_seconds).withColumn("__local", F.lit(False))

    sc = df.sparkSession.sparkContext
    bw = sc.broadcast(dict(weights))
    schema = T.StructType(
        [
            df.schema[entity_col],
            df.schema[ts_col],
            T.StructField(out_col, T.ArrayType(T.FloatType()), False),
        ]
    )
    n_feat = len(feature_cols)

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        wts = bw.value
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n < W:
            empty = pdf.iloc[:0][[entity_col, ts_col]].copy()
            empty[out_col] = pd.Series([], dtype=object)  # not float64: Arrow
            return empty  # needs object dtype to map to list<float>

        feats = pdf[feature_cols].to_numpy(dtype=np.float32)  # (n, F)
        # zero-copy sliding windows: (n-W+1, W, F)
        wins = np.lib.stride_tricks.sliding_window_view(feats, W, axis=0)
        wins = np.swapaxes(wins, 1, 2)
        # window ending at sorted position i (i >= W-1) -> wins[i-W+1]
        if bool(pdf["__local"].iloc[0]):
            # whole-entity group: every row owned, rn = local position
            rn = np.arange(n, dtype=np.int64)
            owned = rn >= W - 1
        else:
            owned = (~pdf["__ctx"].to_numpy()) & (pdf["__rn"].to_numpy() >= W - 1)
        idx = np.nonzero(owned)[0]
        idx = idx[idx >= W - 1]  # context shortfall guard (first chunk)
        if in_stage_conds:
            conds = _cyclical_np(pdf[ts_col])
        elif cond_cols:
            conds = pdf[cond_cols].to_numpy(dtype=np.float32)
        else:
            conds = np.zeros((n, 0), dtype=np.float32)
        outs = []
        for s in range(0, len(idx), sub_batch):
            sel = idx[s : s + sub_batch]
            x = np.ascontiguousarray(wins[sel - (W - 1)])
            h = np.zeros((len(sel), h_dim), dtype=np.float32)
            outs.append(forward_fn(x, h, conds[sel], wts))
        z = np.concatenate(outs) if outs else np.zeros((0, 1), np.float32)
        return pd.DataFrame(
            {
                entity_col: pdf[entity_col].to_numpy()[idx],
                ts_col: pdf[ts_col].to_numpy()[idx],
                out_col: list(z),
            }
        )

    # explicit repartition: AQE coalesces by SHUFFLE BYTES (64MB advisory),
    # but this stage's cost is W^2 encoder compute per row, not bytes — at
    # W=144 AQE squeezed 1M rows into 19 tasks and idled 40% of the cores
    # behind a 29s straggler. A user repartition on the group keys both
    # satisfies the groupBy distribution (no second exchange) and is exempt
    # from AQE coalescing.
    n_parts = df.sparkSession.sparkContext.defaultParallelism * 8
    both = both.repartition(n_parts, F.col(entity_col), F.col("__chunk"))
    return both.groupBy(entity_col, "__chunk").applyInPandas(per_group, schema)
