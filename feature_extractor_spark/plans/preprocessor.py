"""Preprocessor plugin extension point (SURVEY.md §2.9 U4).

The reference loads an EXTERNAL preprocessor plugin by entry point
(group ``preprocessor.plugins``, name ``stl_preprocessor`` — loaded at
/root/reference/app/main.py:92-100, consumed app/data_processor.py:71-77)
whose ``run_preprocessing(config)`` returns windowed arrays + feature
names. That plugin's code is not in the reference repo, so its STL/wavelet
semantics are unverifiable and stay out of scope (SURVEY §2.9 U4); its
sliding-window + datetime-feature duties are native operators here (W1,
P4).

This module is the engine-side extension point with the same shape: a
name -> callable registry where each preprocessor takes (df, config) and
returns a transformed DataFrame. Custom numeric preprocessing that Spark
expressions cannot state plugs in as an Arrow-batched ``applyInPandas`` /
``mapInPandas`` stage — the registered example shows the pattern
(per-entity detrend by rolling-mean removal, vectorized pandas inside).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREPROCESSORS: dict[str, Callable[[DataFrame, dict], DataFrame]] = {}


def register_preprocessor(name: str):
    def deco(fn):
        PREPROCESSORS[name] = fn
        return fn

    return deco


def run_preprocessing(name: str, df: DataFrame, config: dict | None = None) -> DataFrame:
    """Resolve + run a registered preprocessor (the engine analog of the
    reference's plugin.run_preprocessing)."""
    if name not in PREPROCESSORS:
        raise KeyError(
            f"unknown preprocessor {name!r}; registered: {sorted(PREPROCESSORS)}"
        )
    return PREPROCESSORS[name](df, config or {})


@register_preprocessor("passthrough")
def _passthrough(df: DataFrame, config: dict) -> DataFrame:
    return df


@register_preprocessor("detrend_rolling_mean")
def _detrend_rolling_mean(df: DataFrame, config: dict) -> DataFrame:
    """Example applyInPandas preprocessor: subtract a centered rolling mean
    per entity (the kind of stateful numeric preprocessing the reference's
    external plugin performs; STL itself is out of scope — no statsmodels
    here and no verifiable reference semantics)."""
    entity_col = config.get("entity_col", "doc_id")
    ts_col = config.get("ts_col", "ts")
    value_col = config.get("value_col", "value")
    window = int(config.get("window", 24))

    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(f"{value_col}_detrended", T.DoubleType(), True)]
    )

    def per_entity(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        trend = (
            pdf[value_col]
            .rolling(window, center=True, min_periods=1)
            .mean()
        )
        pdf[f"{value_col}_detrended"] = pdf[value_col] - trend
        return pdf

    return df.groupBy(entity_col).applyInPandas(per_entity, schema)


@register_preprocessor("stl_preprocessor")
def _stl_preprocessor(df: DataFrame, config: dict) -> DataFrame:
    """Engine-side twin of the reference's external ``stl_preprocessor``
    plugin, driven by the SAME config knobs the reference's config names
    (/root/reference/app/config.py:89-92 — ``use_stl``, ``stl_period``,
    ``use_wavelets``, ``use_multi_tapper``):

    - always decomposes ``value_col`` into trend/seasonal/resid channels;
      ``use_stl: True`` (default) runs the loess-based Cleveland STL,
      ``False`` the moving-average method — both in functions/decompose.
    - ``use_wavelets`` adds the Haar approximation/detail-energy channels
      over ``window_col`` (requires an array-typed window column, i.e.
      run after the W1 sliding-window stage).
    - ``use_multi_tapper`` (default True, the reference's default) selects
      Thomson DPSS multitaper for the spectral channel over ``window_col``
      (``use_multi_tapper: False`` falls back to the plain periodogram;
      ``use_spectral: False`` drops the channel entirely).
    """
    from feature_extractor_spark.functions.decompose import (
        haar_wavelet_features,
        seasonal_decompose,
        spectral_features,
    )

    entity_col = config.get("entity_col", "doc_id")
    ts_col = config.get("ts_col", "ts")
    value_col = config.get("value_col", "value")
    period = int(config.get("stl_period", 24))
    out = seasonal_decompose(
        df,
        id_col=entity_col,
        ts_col=ts_col,
        value_col=value_col,
        period=period,
        method="stl" if config.get("use_stl", True) else "ma",
        seasonal_smoother=int(config.get("stl_seasonal_smoother", 7)),
    )
    window_col = config.get("window_col")
    if window_col is not None:
        if config.get("use_wavelets", True):
            out = haar_wavelet_features(out, window_col=window_col)
        if config.get("use_spectral", True):
            out = spectral_features(
                out,
                window_col=window_col,
                method=(
                    # default True matches the reference's config default
                    # (/root/reference/app/config.py:92) — use_stl and
                    # use_wavelets already default True for the same reason
                    "multitaper"
                    if config.get("use_multi_tapper", True)
                    else "periodogram"
                ),
                nw=float(config.get("multitaper_nw", 4.0)),
            )
    return out
