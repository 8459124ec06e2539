"""Seasonal/trend decomposition + wavelet channels (preprocessor parity).

The reference ships an external ``stl_preprocessor`` plugin (config keys
``use_stl: True, stl_period: 24, use_wavelets: True`` —
/root/reference/app/config.py:89-91) whose decomposition channels feed
the encoder. The plugin code itself is not in the repo, so this module
provides the engine's clean-room equivalents of the two public methods
those knobs name:

- ``seasonal_decompose``: two methods behind one API. ``method="ma"``
  (default) is the classic moving-average additive decomposition (the
  method statsmodels.seasonal_decompose implements — public textbook
  algorithm): centered (period-weighted) moving-average trend, per-phase
  mean seasonal (centered to zero), residual — expressed entirely with
  per-entity window functions, JVM-side, one shuffle on the entity key,
  no Python in the plan. ``method="stl"`` is the actual loess-based STL
  (Cleveland et al. 1990 — what the ``use_stl`` knob names): loess
  cycle-subseries smoothing + loess trend, run per entity as one Arrow
  applyInPandas group (whole-series algorithm; same entity shuffle).
- ``haar_wavelet_features``: per-window multi-level orthonormal Haar DWT
  producing the deepest approximation coefficients plus per-level detail
  energies — the standard cheap wavelet channel. One Arrow-batched pass
  (whole-batch NumPy reshapes, no per-row Python).

At 10^12 rows the decomposition is a pure window pipeline over the same
(entity, ts) sort the as-of/window stages already impose, so it fuses
into their shuffle rather than adding one.
"""

from __future__ import annotations

import functools as _functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _loess(y, q: int, ext: int = 0, degree: int = 1):
    """Loess smooth of an evenly spaced series, evaluated at every grid
    point (and, with ``ext`` > 0, extrapolated ``ext`` points past each
    end — STL's cycle-subseries step needs one period of extension).

    Local weighted linear fit (tricube weights over the ``q`` nearest
    neighbours, Cleveland 1979 — public method), fully vectorized: one
    (n_eval, q) gather + closed-form weighted-least-squares, O(n*q), no
    Python loop over points. ``degree`` 0 gives the weighted-mean
    (Nadaraya-Watson) variant used for STL's low-pass stage when q is
    tiny. An exact line is reproduced exactly (the linear fit is
    unbiased on linear signals) — pinned in tests.
    """
    import numpy as np

    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n == 0:
        return np.empty(0)
    q = int(max(min(q, n), degree + 1, 1))
    xs = np.arange(-ext, n + ext)  # eval grid
    lo = np.clip(xs - (q - 1) // 2, 0, n - q)  # window starts (n_eval,)
    idx = lo[:, None] + np.arange(q)[None, :]  # (n_eval, q)
    t = idx - xs[:, None]  # local coordinate, eval point at t=0
    d = np.abs(t).astype(np.float64)
    dmax = d.max(axis=1, keepdims=True)
    dmax[dmax == 0] = 1.0
    w = np.clip(1.0 - (d / dmax) ** 3, 0.0, None) ** 3
    # the farthest point gets weight 0; with q <= 2 that degenerates —
    # keep it strictly positive the way STL implementations do
    w[w <= 0] = 1e-9
    Y = y[idx]
    sw = w.sum(axis=1)
    swy = (w * Y).sum(axis=1)
    if degree == 0:
        return swy / sw
    swt = (w * t).sum(axis=1)
    swt2 = (w * t * t).sum(axis=1)
    swty = (w * t * Y).sum(axis=1)
    den = sw * swt2 - swt * swt
    safe = np.abs(den) > 1e-12 * np.maximum(sw * swt2, 1e-300)
    beta0 = np.where(safe, (swt2 * swy - swt * swty) / np.where(safe, den, 1.0), swy / sw)
    return beta0


def _ma(x, k: int):
    """Length-k moving average, valid mode (len shrinks by k-1)."""
    import numpy as np

    return np.convolve(np.asarray(x, dtype=np.float64), np.full(k, 1.0 / k), mode="valid")


def _stl_1d(
    y,
    period: int,
    seasonal_len: int = 7,
    trend_len: int | None = None,
    low_pass_len: int | None = None,
    inner_iters: int = 2,
):
    """Cleveland STL inner loop (STL: A Seasonal-Trend decomposition
    procedure based on Loess, Cleveland et al. 1990 — public textbook
    algorithm; same defaults as statsmodels.tsa.STL with robust=False):

    repeat ``inner_iters`` times:
      1. detrend: y - T
      2. cycle-subseries smoothing: loess(seasonal_len) per phase,
         extended one period past each end (the ext=1 evaluation)
      3. low-pass of the extended seasonal: MA(p) -> MA(p) -> MA(3)
         -> loess(low_pass_len, degree=1); the three valid-mode MAs
         shrink n+2p back to exactly n
      4. seasonal S = C - L  (detrended of the low-pass keeps S free of
         drift the trend should own)
      5. trend T = loess(y - S, trend_len)

    No robustness (outer) iterations — n_o=0, the statsmodels default.
    Returns (trend, seasonal, resid) arrays of len(y). NaNs propagate.
    """
    import numpy as np

    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    p = int(period)
    if seasonal_len % 2 == 0:
        seasonal_len += 1
    if low_pass_len is None:
        low_pass_len = p + (1 - p % 2)  # next odd >= p
    if trend_len is None:
        # Cleveland's recommendation: smallest odd >= 1.5p/(1-1.5/n_s)
        t = int(np.ceil(1.5 * p / (1.0 - 1.5 / seasonal_len)))
        trend_len = t + (1 - t % 2)
    if n < 2 * p:
        # too short for a seasonal estimate: trend-only fallback
        T = _loess(y, trend_len)
        return T, np.zeros(n), y - T
    T = np.zeros(n)
    S = np.zeros(n)
    for _ in range(max(1, int(inner_iters))):
        detr = y - T
        C = np.empty(n + 2 * p)
        for ph in range(p):
            C[ph::p] = _loess(detr[ph::p], seasonal_len, ext=1)
        L = _loess(_ma(_ma(_ma(C, p), p), 3), low_pass_len)
        S = C[p : n + p] - L
        T = _loess(y - S, trend_len)
    return T, S, y - T - S


def seasonal_decompose(
    df: DataFrame,
    id_col: str = "doc_id",
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 24,
    out_prefix: str | None = None,
    method: str = "ma",
    seasonal_smoother: int = 7,
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

    ``method="stl"`` runs the actual loess-based STL instead (Cleveland
    et al. 1990 — the method the reference's ``use_stl`` knob names,
    /root/reference/app/config.py:89): loess-smoothed cycle-subseries
    (span ``seasonal_smoother``) let the seasonal component's shape and
    amplitude drift over time, and the loess trend follows curvature the
    centered MA biases. Same output columns. STL is a whole-series
    algorithm, so it runs per entity as one Arrow ``applyInPandas``
    group — one shuffle on the entity key (the same partitioning every
    window stage uses) and O(n * trend_len) NumPy per entity; the
    per-entity series must fit an executor, the contract every
    per-entity stage here shares (the reference processes one file per
    entity, so parity holds by construction).
    """
    p = int(period)
    if p < 2:
        raise ValueError(f"seasonal_decompose: period must be >= 2, got {p}")
    pre = f"{out_prefix}_" if out_prefix else ""
    if method == "stl":
        return _seasonal_decompose_stl(
            df, id_col, ts_col, value_col, p, pre, seasonal_smoother
        )
    if method != "ma":
        raise ValueError(
            f"seasonal_decompose: method must be 'ma' or 'stl', got {method!r}"
        )
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


def _seasonal_decompose_stl(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    value_col: str,
    period: int,
    pre: str,
    seasonal_smoother: int,
) -> DataFrame:
    """applyInPandas twin of seasonal_decompose for method='stl': sorts
    each entity's series by ts and runs the NumPy STL inner loop."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(f"{pre}trend", T.DoubleType()),
            T.StructField(f"{pre}seasonal", T.DoubleType()),
            T.StructField(f"{pre}resid", T.DoubleType()),
        ]
    )

    def per_entity(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        t, s, r = _stl_1d(
            pdf[value_col].to_numpy(dtype="float64"),
            period,
            seasonal_len=seasonal_smoother,
        )
        pdf[f"{pre}trend"] = t
        pdf[f"{pre}seasonal"] = s
        pdf[f"{pre}resid"] = r
        return pdf

    return df.groupBy(id_col).applyInPandas(per_entity, schema)


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


@_functools.lru_cache(maxsize=64)
def _dpss_tapers(n: int, nw: float, k: int):
    """First ``k`` discrete prolate spheroidal (Slepian) tapers of length
    ``n`` at time-bandwidth product ``nw`` — computed from the classic
    symmetric tridiagonal commuting matrix (Slepian 1978; Percival &
    Walden 1993 §8.3 — public method), whose eigenvectors ARE the DPSS,
    ordered by eigenvalue. Pure NumPy (no scipy in the container): the
    dense symmetric eigendecomposition is O(n^3), so the module-level
    ``lru_cache`` keyed on (n, nw, k) makes it run once per distinct
    window length PER PYTHON WORKER PROCESS — a closure-level cache would
    rerun it for every mapInPandas partition that sees the length.
    Tapers are scaled to ||v||^2 = n so a white-noise multitaper spectrum
    matches the boxcar periodogram's scale. Signs are irrelevant
    downstream (|fft|^2)."""
    import numpy as np

    w = nw / n
    t = np.arange(n)
    diag = ((n - 1 - 2.0 * t) / 2.0) ** 2 * np.cos(2 * np.pi * w)
    off = np.arange(1, n) * (n - np.arange(1, n)) / 2.0
    A = np.diag(diag) + np.diag(off, 1) + np.diag(off, -1)
    _, vecs = np.linalg.eigh(A)
    tapers = vecs[:, ::-1][:, :k].T  # (k, n), unit norm from eigh
    return tapers * np.sqrt(n)


def spectral_features(
    df: DataFrame,
    window_col: str = "window",
    n_bands: int = 4,
    out_prefix: str = "sp",
    method: str = "periodogram",
    nw: float = 4.0,
    k_tapers: int | None = None,
) -> DataFrame:
    """Per-window spectral features — the third channel of the
    reference's preprocessing trio (its stl_preprocessor plugin family
    names STL, wavelets, and multitaper spectral estimation; the plugin
    code is external, so both estimators here are clean-room from the
    public methods): ``method="periodogram"`` (default) is the plain
    single-taper spectrum; ``method="multitaper"`` is Thomson's DPSS
    multitaper estimate.

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

    ``method="multitaper"`` computes the proper Thomson multitaper
    estimate instead (the method the reference's ``use_multi_tapper``
    knob names, /root/reference/app/config.py:91): the spectrum is the
    mean of ``k_tapers`` (default 2*nw - 1) eigenspectra, each the
    periodogram of the window multiplied by one DPSS (Slepian) taper —
    variance shrinks ~1/K at equal bandwidth (pinned in tests). Tapers
    depend only on (window length, nw, K), so they are computed once per
    distinct length per Python worker PROCESS (module-level lru_cache on
    ``_dpss_tapers`` — it persists across mapInPandas partitions and
    queries); the per-row cost stays one batched rfft per taper.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if method not in ("periodogram", "multitaper"):
        raise ValueError(
            f"spectral_features: method must be 'periodogram' or "
            f"'multitaper', got {method!r}"
        )
    k = int(k_tapers) if k_tapers is not None else max(1, int(2 * nw - 1))

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(f"{out_prefix}_band_power", T.ArrayType(T.DoubleType())),
            T.StructField(f"{out_prefix}_dom_freq", T.DoubleType()),
            T.StructField(f"{out_prefix}_spec_entropy", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def spectrum(X: np.ndarray) -> np.ndarray:
            if method == "periodogram":
                return np.abs(np.fft.rfft(X, axis=1)) ** 2
            L = X.shape[1]
            # module-level lru_cache: the O(L^3) eigendecomposition runs
            # once per distinct (L, nw, k) per worker PROCESS, not per
            # mapInPandas partition
            tapers = _dpss_tapers(int(L), float(nw), int(min(k, L)))
            # mean over K eigenspectra: (K, rows, nf) -> (rows, nf)
            eig = np.abs(np.fft.rfft(X[None, :, :] * tapers[:, None, :], axis=2)) ** 2
            return eig.mean(axis=0)  # ||v||^2 = n makes this boxcar-scaled

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
                spec = spectrum(X)  # (rows, L//2+1)
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
