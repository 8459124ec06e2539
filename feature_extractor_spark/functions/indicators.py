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
    """EMA + MACD per entity (order-recursive; pandas ewm(adjust=False):
    y_t = a*x_t + (1-a)*y_{t-1}).

    Physical plan: hash-partition whole entities, sort within partitions on
    (entity, ts), then ONE mapInPandas pass. Within each Arrow batch all
    fully-contained entities run through ONE vectorized
    ``groupby(...).ewm(...)`` per span; the single entity that can straddle
    a batch boundary (the partition is entity-sorted, so there is at most
    one) is re-seeded exactly via the prepend-carry trick — prepending the
    carried EMA as a synthetic first sample makes ewm reproduce the
    recursion bit-for-bit, and the synthetic row is dropped.

    Why not groupBy().applyInPandas: one Arrow batch + scheduling round per
    entity — measured 5.3 s for 100k rows over 1,500 entities at sf0.1
    (~3.5 ms/entity of pure overhead); at 10^12 rows with millions of
    entities that per-group constant dominates everything. This path is
    ~60 entities per Arrow batch with zero per-entity Spark machinery."""
    from typing import Iterator

    fast, slow, signal = macd
    spans = list(ema_spans)
    # per-series carried state, in a fixed order
    series = [("ema_%d" % s, s) for s in spans] + [
        ("__ema_fast", fast),
        ("__ema_slow", slow),
    ]
    fields = list(df.schema.fields)
    for s in spans:
        fields.append(T.StructField(f"ema_{s}", T.DoubleType(), True))
    fields += [
        T.StructField("macd", T.DoubleType(), True),
        T.StructField("macd_signal", T.DoubleType(), True),
        T.StructField("macd_hist", T.DoubleType(), True),
    ]
    schema = T.StructType(fields)
    in_cols = df.columns

    def _seeded_ewm(x: pd.Series, span: int, prev: float | None) -> pd.Series:
        if prev is None:
            return x.ewm(span=span, adjust=False).mean()
        y = pd.concat([pd.Series([prev]), x], ignore_index=True)
        return (
            y.ewm(span=span, adjust=False).mean().iloc[1:].reset_index(drop=True)
        )

    def _emit(g: pd.DataFrame, carry: dict | None) -> pd.DataFrame:
        """EMA columns for one (possibly carried-into) entity block; the
        internal __ema_fast/__ema_slow columns stay on the frame so the
        next batch's carry can be read off its tail."""
        c = g[close_col].reset_index(drop=True).astype(float)
        out = g.reset_index(drop=True)
        for name, span in series:
            out[name] = _seeded_ewm(
                c, span, carry.get(name) if carry else None
            ).to_numpy()
        m = out["__ema_fast"] - out["__ema_slow"]
        sig = _seeded_ewm(m, signal, carry.get("sig") if carry else None)
        out["macd"] = m.to_numpy()
        out["macd_signal"] = sig.to_numpy()
        out["macd_hist"] = (m - sig.to_numpy()).to_numpy()
        return out

    out_names = [f.name for f in schema.fields]
    carry_names = [name for name, _ in series]

    def _same(a, b):
        return (pd.isna(a) and pd.isna(b)) or a == b

    def _key_mask(col: pd.Series, key):
        return col.isna() if pd.isna(key) else (col == key)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry_key = None
        carry: dict | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            frames = []
            first_key = pdf[entity_col].iloc[0]
            if carry is not None and _same(first_key, carry_key):
                mask = _key_mask(pdf[entity_col], first_key)
                frames.append(_emit(pdf[mask], carry))
                rest = pdf[~mask]
            else:
                rest = pdf
            if len(rest):
                # all fully-batch-local groups: vectorized groupby.ewm
                out = rest.reset_index(drop=True).copy()
                c = out[close_col].astype(float)
                # factorize with NaN as a real category: pandas groupby
                # silently DROPS null keys, which would leave null-entity
                # rows with NaN indicators
                keys, _ = pd.factorize(
                    out[entity_col], use_na_sentinel=False
                )
                for name, span in series:
                    out[name] = c.groupby(keys).transform(
                        lambda s, sp=span: s.ewm(span=sp, adjust=False).mean()
                    )
                m = out["__ema_fast"] - out["__ema_slow"]
                sig = m.groupby(keys).transform(
                    lambda s: s.ewm(span=signal, adjust=False).mean()
                )
                out["macd"] = m
                out["macd_signal"] = sig
                out["macd_hist"] = m - sig
                frames.append(out)
            merged = pd.concat(frames, ignore_index=True)
            # carry = final state of the batch's LAST entity (partitions are
            # entity-sorted, so only it can continue into the next batch)
            carry_key = pdf[entity_col].iloc[-1]
            tail = merged[_key_mask(merged[entity_col], carry_key)].iloc[-1]
            carry = {name: float(tail[name]) for name in carry_names}
            carry["sig"] = float(tail["macd_signal"])
            yield merged[out_names]

    out_df = (
        df.repartition(
            df.sparkSession.sparkContext.defaultParallelism * 2, entity_col
        )
        .sortWithinPartitions(entity_col, ts_col)
        .mapInPandas(run, schema)
    )
    return out_df


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
