"""W1/W3/P3 parity: golden sliding-window semantics from the reference's
own (stale but normative) unit tests
(/root/reference/tests/unit_tests/test_data_handler.py:37-76): stride 1,
N-W+1 windows, empty when N < W, window label at the LAST step."""

import datetime as dt

import pandas as pd
import pytest

from feature_extractor_spark.operators.windows import (
    lag_lead_features,
    last_step,
    sliding_windows,
    sliding_windows_map_in_pandas,
)


def _series_df(spark, n=20, entities=("a", "b")):
    rows = []
    for e in entities:
        for i in range(n):
            rows.append(
                (e, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), float(i) + (0.5 if e == "b" else 0.0))
            )
    return spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")


def _oracle_windows(n, w, offset=0.0):
    """Pandas/Python oracle: stride-1 windows, N-W+1 of them."""
    vals = [float(i) + offset for i in range(n)]
    return [vals[i : i + w] for i in range(n - w + 1)] if n >= w else []


@pytest.mark.parametrize("w", [1, 3, 5])
def test_sliding_window_counts_and_values(spark, w):
    n = 12
    df = _series_df(spark, n=n, entities=("a",))
    got = (
        sliding_windows(df, "doc_id", "ts", ["value"], w)
        .orderBy("ts")
        .collect()
    )
    exp = _oracle_windows(n, w)
    assert len(got) == n - w + 1
    assert [list(r["window"]) for r in got] == exp


def test_sliding_window_empty_when_short(spark):
    df = _series_df(spark, n=3, entities=("a",))
    assert sliding_windows(df, "doc_id", "ts", ["value"], 5).count() == 0


def test_sliding_window_exact_length(spark):
    df = _series_df(spark, n=4, entities=("a",))
    got = sliding_windows(df, "doc_id", "ts", ["value"], 4).collect()
    assert len(got) == 1
    assert list(got[0]["window"]) == [0.0, 1.0, 2.0, 3.0]


def test_map_in_pandas_path_matches_collect_list(spark):
    n, w = 30, 7
    df = _series_df(spark, n=n, entities=("a", "b", "c"))
    a = sliding_windows(df, "doc_id", "ts", ["value"], w)
    b = sliding_windows_map_in_pandas(df, "doc_id", "ts", "value", w)
    pa = a.orderBy("doc_id", "ts").toPandas()
    pb = b.orderBy("doc_id", "ts").toPandas()
    assert len(pa) == len(pb) == 3 * (n - w + 1)
    for x, y in zip(pa["window"], pb["window"]):
        assert list(x) == list(y)


def test_map_in_pandas_cross_batch_carry(spark):
    """An entity spanning multiple Arrow batches must lose no windows: with
    maxRecordsPerBatch=50 and n=200 rows/entity, the naive per-batch pass
    dropped W-1 windows per boundary (176 vs 194 at W=7)."""
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "50")
    try:
        n, w = 200, 7
        df = _series_df(spark, n=n, entities=("a", "b"))
        got = (
            sliding_windows_map_in_pandas(df, "doc_id", "ts", "value", w)
            .orderBy("doc_id", "ts")
            .toPandas()
        )
        assert len(got) == 2 * (n - w + 1)
        exp = _oracle_windows(n, w)
        got_a = got[got["doc_id"] == "a"]["window"].tolist()
        assert [list(x) for x in got_a] == exp
    finally:
        spark.conf.set(conf, old)


def test_map_in_pandas_keeps_null_entity_rows(spark):
    """ADVICE r2: a NULL entity key must form one group exactly like
    Window.partitionBy does in sliding_windows — pandas groupby dropna and
    NaN != NaN carry comparisons silently dropped those rows before."""
    rows = []
    for e in ("a", None):
        for i in range(12):
            rows.append((e, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), float(i)))
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")
    w = 4
    a = sliding_windows(df, "doc_id", "ts", ["value"], w).orderBy("doc_id", "ts").toPandas()
    b = (
        sliding_windows_map_in_pandas(df, "doc_id", "ts", "value", w)
        .orderBy("doc_id", "ts")
        .toPandas()
    )
    assert len(a) == len(b) == 2 * (12 - w + 1)
    null_b = b[b["doc_id"].isna()]
    assert len(null_b) == 12 - w + 1
    assert [list(x) for x in null_b["window"]] == _oracle_windows(12, w)


def test_map_in_pandas_null_entity_cross_batch(spark):
    """Null entity spanning Arrow batch boundaries: the isna-aware carry
    must prepend history across batches for the NaN key too."""
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "50")
    try:
        n, w = 150, 6
        rows = [
            (None, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), float(i))
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")
        got = (
            sliding_windows_map_in_pandas(df, "doc_id", "ts", "value", w)
            .orderBy("ts")
            .toPandas()
        )
        assert len(got) == n - w + 1
        assert [list(x) for x in got["window"]] == _oracle_windows(n, w)
    finally:
        spark.conf.set(conf, old)


def test_last_step_is_point_in_time(spark):
    """P3 + zero-leakage: the target equals the value AT the window ts."""
    df = _series_df(spark, n=10, entities=("a",))
    win = sliding_windows(df, "doc_id", "ts", ["value"], 4)
    got = last_step(win, "window").join(df, ["doc_id", "ts"]).collect()
    for r in got:
        assert r["target"] == r["value"]


def test_temporal_leakage_property(spark):
    """Perturb rows with ts > t: windows at ts <= t must not change."""
    n, w = 16, 4
    base = _series_df(spark, n=n, entities=("a",))
    cut = dt.datetime(2024, 1, 1) + dt.timedelta(hours=9)
    from pyspark.sql import functions as F

    perturbed = base.withColumn(
        "value", F.when(F.col("ts") > cut, F.col("value") * 1000 + 7).otherwise(F.col("value"))
    )
    wa = sliding_windows(base, "doc_id", "ts", ["value"], w).filter(F.col("ts") <= cut)
    wb = sliding_windows(perturbed, "doc_id", "ts", ["value"], w).filter(F.col("ts") <= cut)
    pa = wa.orderBy("ts").toPandas()
    pb = wb.orderBy("ts").toPandas()
    assert len(pa) == len(pb) > 0
    for x, y in zip(pa["window"], pb["window"]):
        assert list(x) == list(y)


def test_lag_lead(spark):
    df = _series_df(spark, n=6, entities=("a",))
    out = (
        lag_lead_features(df, "doc_id", "ts", "value", lags=[1, 2], leads=[1])
        .orderBy("ts")
        .toPandas()
    )
    assert out["value_lag_1"].tolist()[1:] == out["value"].tolist()[:-1]
    assert pd.isna(out["value_lag_1"].iloc[0])
    assert pd.isna(out["value_lag_2"].iloc[1])
    assert out["value_lead_1"].tolist()[:-1] == out["value"].tolist()[1:]


def test_sliding_windows_auto_keeps_null_keys(spark):
    """Null-entity rows take the light path instead of vanishing."""
    import datetime as _dt
    from feature_extractor_spark.operators.windows import sliding_windows_auto

    t = _dt.datetime(2024, 1, 1)
    rows = [("a", t + _dt.timedelta(hours=i), float(i)) for i in range(10)]
    rows += [(None, t + _dt.timedelta(hours=i), 50.0 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")
    out = sliding_windows_auto(
        df, "doc_id", "ts", ["value"], 3, heavy_keys=["a"], ts_chunk_seconds=3600
    )
    got = out.toPandas()
    assert len(got[got["doc_id"].isna()]) == 5 - 3 + 1  # null entity windows
    assert len(got) == (10 - 3 + 1) + 3


def test_map_in_pandas_multi_column_matches_collect_list(spark):
    """value_cols as a LIST: array<struct> output equal to sliding_windows'
    multi-column payload — multi-feature callers no longer need the
    collect_list path (VERDICT r3 item 6). Includes cross-batch carry."""
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "40")
    try:
        from pyspark.sql import functions as F

        n, w = 100, 6
        df = _series_df(spark, n=n, entities=("a", "b")).withColumn(
            "v2", F.col("value") * 2.0
        )
        a = sliding_windows(df, "doc_id", "ts", ["value", "v2"], w)
        b = sliding_windows_map_in_pandas(df, "doc_id", "ts", ["value", "v2"], w)
        pa_ = a.orderBy("doc_id", "ts").toPandas()
        pb = b.orderBy("doc_id", "ts").toPandas()
        assert len(pa_) == len(pb) == 2 * (n - w + 1)
        for x, y in zip(pa_["window"], pb["window"]):
            assert [tuple(s) for s in x] == [tuple(s) for s in y]
        # single-element list == scalar behavior parity
        c = sliding_windows_map_in_pandas(df, "doc_id", "ts", ["value"], w)
        pc = c.orderBy("doc_id", "ts").toPandas()
        assert [list(r) for r in pc["window"]][:3] == [
            [x["value"] for x in r] for r in pb["window"][:3]
        ]
    finally:
        spark.conf.set(conf, old)
