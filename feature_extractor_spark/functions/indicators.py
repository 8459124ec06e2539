"""Rolling technical indicators (SURVEY.md §2.5 W7).

Spec source: /root/reference/app/ARCHITECTURE_23_FEATURES.md:46-79 — RSI(14),
EMA(20/50), MACD(12,26,9), Stochastic(14,3), ATR(14) over OHLC.

Frame-expressible indicators (SMA, rolling min/max, RSI with simple
averages, Stochastic %K/%D, ATR with simple average) are pure window
expressions — codegen'd, one shuffle on the entity key shared across all of
them. EMA (and therefore MACD) is order-recursive and NOT expressible as a
frame aggregate; it runs per-entity in ``applyInPandas`` (vectorized pandas
``ewm`` — one Arrow round-trip per entity group, no per-row Python).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _w(entity_col: str, ts_col: str, n: int) -> Window:
    return (
        Window.partitionBy(entity_col).orderBy(ts_col).rowsBetween(-(n - 1), 0)
    )


def sma(df: DataFrame, entity_col: str, ts_col: str, col: str, n: int) -> DataFrame:
    return df.withColumn(f"sma_{n}", F.avg(col).over(_w(entity_col, ts_col, n)))


def rsi(
    df: DataFrame, entity_col: str, ts_col: str, close_col: str, n: int = 14
) -> DataFrame:
    """RSI with simple (Cutler) averages: 100 - 100/(1 + avgGain/avgLoss)."""
    w1 = Window.partitionBy(entity_col).orderBy(ts_col)
    delta = F.col(close_col) - F.lag(close_col).over(w1)
    up = F.when(delta > 0, delta).otherwise(F.lit(0.0))
    dn = F.when(delta < 0, -delta).otherwise(F.lit(0.0))
    out = df.withColumn("__up", up).withColumn("__dn", dn)
    wn = _w(entity_col, ts_col, n)
    avg_up = F.avg("__up").over(wn)
    avg_dn = F.avg("__dn").over(wn)
    rsi_col = F.when(avg_dn == 0, F.lit(100.0)).otherwise(
        100.0 - 100.0 / (1.0 + avg_up / avg_dn)
    )
    return out.withColumn(f"rsi_{n}", rsi_col).drop("__up", "__dn")


def stochastic(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    high_col: str,
    low_col: str,
    close_col: str,
    n: int = 14,
    d: int = 3,
) -> DataFrame:
    wn = _w(entity_col, ts_col, n)
    hh = F.max(high_col).over(wn)
    ll = F.min(low_col).over(wn)
    k = F.when(hh == ll, F.lit(50.0)).otherwise(
        100.0 * (F.col(close_col) - ll) / (hh - ll)
    )
    out = df.withColumn(f"stoch_k_{n}", k)
    wd = _w(entity_col, ts_col, d)
    return out.withColumn(f"stoch_d_{n}_{d}", F.avg(f"stoch_k_{n}").over(wd))


def atr(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    high_col: str,
    low_col: str,
    close_col: str,
    n: int = 14,
) -> DataFrame:
    """ATR with simple rolling average of true range."""
    w1 = Window.partitionBy(entity_col).orderBy(ts_col)
    prev_close = F.lag(close_col).over(w1)
    tr = F.greatest(
        F.col(high_col) - F.col(low_col),
        F.abs(F.col(high_col) - prev_close),
        F.abs(F.col(low_col) - prev_close),
    )
    out = df.withColumn("__tr", F.coalesce(tr, F.col(high_col) - F.col(low_col)))
    return out.withColumn(
        f"atr_{n}", F.avg("__tr").over(_w(entity_col, ts_col, n))
    ).drop("__tr")


def ema_macd(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    close_col: str,
    ema_spans: tuple[int, ...] = (20, 50),
    macd: tuple[int, int, int] = (12, 26, 9),
) -> DataFrame:
    """EMA + MACD per entity via applyInPandas (order-recursive — one Arrow
    batch per entity group, pandas ewm vectorizes inside).

    adjust=False matches the standard recursive definition
    y_t = a*x_t + (1-a)*y_{t-1}."""
    fast, slow, signal = macd
    fields = list(df.schema.fields)
    for s in ema_spans:
        fields.append(T.StructField(f"ema_{s}", T.DoubleType(), True))
    fields += [
        T.StructField("macd", T.DoubleType(), True),
        T.StructField("macd_signal", T.DoubleType(), True),
        T.StructField("macd_hist", T.DoubleType(), True),
    ]
    schema = T.StructType(fields)

    def per_entity(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        c = pdf[close_col]
        for s in ema_spans:
            pdf[f"ema_{s}"] = c.ewm(span=s, adjust=False).mean()
        ema_f = c.ewm(span=fast, adjust=False).mean()
        ema_s = c.ewm(span=slow, adjust=False).mean()
        pdf["macd"] = ema_f - ema_s
        pdf["macd_signal"] = pdf["macd"].ewm(span=signal, adjust=False).mean()
        pdf["macd_hist"] = pdf["macd"] - pdf["macd_signal"]
        return pdf

    return df.groupBy(entity_col).applyInPandas(per_entity, schema)


def ohlc_indicators(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    open_col: str = "OPEN",
    high_col: str = "HIGH",
    low_col: str = "LOW",
    close_col: str = "CLOSE",
) -> DataFrame:
    """The reference's indicator set in one pass: all frame-based indicators
    share one (entity, ts) sort, then a single applyInPandas adds EMA/MACD."""
    out = rsi(df, entity_col, ts_col, close_col, 14)
    out = stochastic(out, entity_col, ts_col, high_col, low_col, close_col, 14, 3)
    out = atr(out, entity_col, ts_col, high_col, low_col, close_col, 14)
    out = sma(out, entity_col, ts_col, close_col, 20)
    return ema_macd(out, entity_col, ts_col, close_col)
