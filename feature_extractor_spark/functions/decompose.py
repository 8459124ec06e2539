"""Seasonal/trend decomposition + wavelet channels (preprocessor parity).

The reference ships an external ``stl_preprocessor`` plugin (config keys
``use_stl: True, stl_period: 24, use_wavelets: True`` —
/root/reference/app/config.py:89-91) whose decomposition channels feed
the encoder. The plugin code itself is not in the repo, so this module
provides the engine's clean-room equivalents of the two public methods
those knobs name:

- ``seasonal_decompose``: the classic moving-average additive
  decomposition (the method statsmodels.seasonal_decompose implements —
  public textbook algorithm): centered (period-weighted) moving-average
  trend, per-phase mean seasonal (centered to zero), residual. Expressed
  entirely with per-entity window functions — JVM-side, one shuffle on
  the entity key, no Python in the plan.
- ``haar_wavelet_features``: per-window multi-level orthonormal Haar DWT
  producing the deepest approximation coefficients plus per-level detail
  energies — the standard cheap wavelet channel. One Arrow-batched pass
  (whole-batch NumPy reshapes, no per-row Python).

At 10^12 rows the decomposition is a pure window pipeline over the same
(entity, ts) sort the as-of/window stages already impose, so it fuses
into their shuffle rather than adding one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seasonal_decompose(
    df: DataFrame,
    id_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 24,
    out_prefix: str | None = None,
) -> DataFrame:
    """Additive seasonal decomposition: value = trend + seasonal + resid.

    Semantics match the classic moving-average method (public algorithm;
    same as statsmodels.tsa.seasonal_decompose defaults):

    - trend: centered moving average of length ``period``; for EVEN
      period the standard 2x(MA) form — the mean of the two length-p
      averages offset by one row, equivalent to convolving with
      [0.5, 1, ..., 1, 0.5]/p over p+1 points. Null where the full
      window is not available (series edges).
    - seasonal: the mean of (value - trend) per phase (position in the
      period cycle), centered so the seasonal component sums to ~0 over
      one period, tiled over the series.
    - resid: value - trend - seasonal (null where trend is null).

    Adds ``trend``/``seasonal``/``resid`` columns (prefixed with
    ``out_prefix`` if given). Rows are phase-indexed by per-entity ts
    order, so ts gaps shift phase exactly as a positional index would —
    the same convention the reference's hourly data uses (period 24 ==
    one day at 1h cadence, config stl_period).
    """
    p = int(period)
    if p < 2:
        raise ValueError(f"seasonal_decompose: period must be >= 2, got {p}")
    pre = f"{out_prefix}_" if out_prefix else ""
    w_ord = Window.partitionBy(id_col).orderBy(ts_col)

    if p % 2 == 0:
        h = p // 2
        w_a = w_ord.rowsBetween(-h, h - 1)
        w_b = w_ord.rowsBetween(-h + 1, h)
        full = (F.count(value_col).over(w_a) == p) & (
            F.count(value_col).over(w_b) == p
        )
        trend = F.when(
            full,
            (F.avg(value_col).over(w_a) + F.avg(value_col).over(w_b)) / 2.0,
        )
    else:
        h = (p - 1) // 2
        w_c = w_ord.rowsBetween(-h, h)
        trend = F.when(
            F.count(value_col).over(w_c) == p, F.avg(value_col).over(w_c)
        )

    phase = F.pmod(F.row_number().over(w_ord) - 1, F.lit(p))
    out = df.withColumn(f"{pre}trend", trend).withColumn("__phase", phase)
    detr = F.col(value_col) - F.col(f"{pre}trend")
    w_phase = Window.partitionBy(id_col, "__phase")
    w_ent = Window.partitionBy(id_col)
    raw_seasonal = F.avg(detr).over(w_phase)
    # center: subtract the mean of the per-phase averages (statsmodels
    # period_averages -= period_averages.mean()). A plain avg over rows
    # would weight phases by their row counts, so average ONE
    # representative row per phase instead
    first_in_phase = F.row_number().over(
        Window.partitionBy(id_col, "__phase").orderBy(ts_col)
    ) == 1
    mean_of_phase_means = F.avg(
        F.when(first_in_phase, raw_seasonal)
    ).over(w_ent)
    seasonal = raw_seasonal - mean_of_phase_means
    out = out.withColumn(f"{pre}seasonal", seasonal).withColumn(
        f"{pre}resid",
        F.col(value_col) - F.col(f"{pre}trend") - F.col(f"{pre}seasonal"),
    )
    return out.drop("__phase")


def haar_wavelet_features(
    df: DataFrame,
    window_col: str = "window",
    levels: int | None = None,
    out_prefix: str = "wv",
) -> DataFrame:
    """Multi-level orthonormal Haar DWT over an array-typed window column.

    Per row: truncate the window to the largest power-of-two length,
    then repeatedly split into approximation ``(x0+x1)/sqrt(2)`` and
    detail ``(x0-x1)/sqrt(2)`` pairs for ``levels`` levels (default: all
    the way down). Emits:

    - ``{prefix}_approx``: array<double>, the deepest approximation
      coefficients (the coarse channel the reference's wavelet
      preprocessing feeds the encoder),
    - ``{prefix}_detail_energy``: array<double>, one entry per level =
      sum of squared detail coefficients at that level (finest first).

    Orthonormal Haar preserves energy exactly (Parseval):
    sum(detail energies) + ||approx||^2 == ||signal||^2 — pinned in
    tests. One Arrow-batched pass; per batch the kernel is whole-matrix
    NumPy reshape/add — no per-row Python beyond list conversion.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(f"{out_prefix}_approx", T.ArrayType(T.DoubleType())),
            T.StructField(
                f"{out_prefix}_detail_energy", T.ArrayType(T.DoubleType())
            ),
        ]
    )
    inv_sqrt2 = 1.0 / np.sqrt(2.0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            approxs, energies = [], []
            # group rows by window length so each same-length slice runs
            # as one (rows, W) matrix through the level loop
            arrs = [np.asarray(v, dtype=np.float64) for v in pdf[window_col]]
            lens = np.array([len(a) for a in arrs])
            approx_out: list = [None] * len(arrs)
            energy_out: list = [None] * len(arrs)
            for L in np.unique(lens):
                idx = np.nonzero(lens == L)[0]
                if L == 0:
                    for i in idx:
                        approx_out[i] = []
                        energy_out[i] = []
                    continue
                pow2 = 1 << int(np.floor(np.log2(L)))
                X = np.stack([arrs[i][:pow2] for i in idx])
                max_levels = int(np.log2(pow2))
                n_levels = max_levels if levels is None else min(levels, max_levels)
                es = []
                for _ in range(n_levels):
                    X2 = X.reshape(X.shape[0], -1, 2)
                    detail = (X2[:, :, 0] - X2[:, :, 1]) * inv_sqrt2
                    X = (X2[:, :, 0] + X2[:, :, 1]) * inv_sqrt2
                    es.append((detail**2).sum(axis=1))
                E = np.stack(es, axis=1) if es else np.zeros((len(idx), 0))
                for j, i in enumerate(idx):
                    approx_out[i] = [float(x) for x in X[j]]
                    energy_out[i] = [float(x) for x in E[j]]
            pdf = pdf.copy()
            pdf[f"{out_prefix}_approx"] = approx_out
            pdf[f"{out_prefix}_detail_energy"] = energy_out
            yield pdf

    return df.mapInPandas(run, schema)


def spectral_features(
    df: DataFrame,
    window_col: str = "window",
    n_bands: int = 4,
    out_prefix: str = "sp",
) -> DataFrame:
    """Per-window periodogram features — the third channel of the
    reference's preprocessing trio (its stl_preprocessor plugin family
    names STL, wavelets, and multitaper spectral estimation; the plugin
    code is external, so this is the clean-room spectral channel: the
    plain periodogram, the single-taper special case every multitaper
    method averages over).

    Per row (array-typed window of length W):
    - ``{prefix}_band_power``: array<double>, ``n_bands`` equal slices of
      the one-sided power spectrum (DC excluded), each the mean power in
      that frequency band,
    - ``{prefix}_dom_freq``: dominant nonzero frequency as a fraction of
      the sampling rate in [0, 0.5],
    - ``{prefix}_spec_entropy``: normalized spectral entropy in [0, 1]
      (flat spectrum -> 1, pure tone -> ~0).

    One Arrow-batched pass; same-length windows batch into a single
    ``np.fft.rfft`` over a (rows, W) matrix — no per-row FFT calls.
    Windows shorter than 4 samples emit nulls.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(f"{out_prefix}_band_power", T.ArrayType(T.DoubleType())),
            T.StructField(f"{out_prefix}_dom_freq", T.DoubleType()),
            T.StructField(f"{out_prefix}_spec_entropy", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            arrs = [np.asarray(v, dtype=np.float64) for v in pdf[window_col]]
            lens = np.array([len(a) for a in arrs])
            bp: list = [None] * len(arrs)
            domf: list = [None] * len(arrs)
            ent: list = [None] * len(arrs)
            for L in np.unique(lens):
                idx = np.nonzero(lens == L)[0]
                if L < 4:
                    continue
                X = np.stack([arrs[i] for i in idx])
                spec = np.abs(np.fft.rfft(X, axis=1)) ** 2  # (rows, L//2+1)
                pos = spec[:, 1:]  # drop DC
                nf = pos.shape[1]
                freqs = np.arange(1, nf + 1) / L
                # band powers: n_bands equal slices of the positive axis
                edges = np.linspace(0, nf, n_bands + 1).astype(int)
                bands = np.stack(
                    [
                        pos[:, a:b].mean(axis=1) if b > a else np.zeros(len(idx))
                        for a, b in zip(edges[:-1], edges[1:])
                    ],
                    axis=1,
                )
                dom = freqs[np.argmax(pos, axis=1)]
                tot = pos.sum(axis=1, keepdims=True)
                p = np.where(tot > 0, pos / np.maximum(tot, 1e-300), 0.0)
                with np.errstate(divide="ignore", invalid="ignore"):
                    h = -(p * np.where(p > 0, np.log(p), 0.0)).sum(axis=1)
                h_norm = h / np.log(nf) if nf > 1 else np.zeros(len(idx))
                for j, i in enumerate(idx):
                    bp[i] = [float(x) for x in bands[j]]
                    domf[i] = float(dom[j])
                    ent[i] = float(h_norm[j])
            pdf = pdf.copy()
            pdf[f"{out_prefix}_band_power"] = bp
            pdf[f"{out_prefix}_dom_freq"] = domf
            pdf[f"{out_prefix}_spec_entropy"] = ent
            yield pdf

    return df.mapInPandas(run, schema)
