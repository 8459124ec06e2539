"""W6 sessionization + A7 unwindow parity."""

import datetime as dt

from feature_extractor_spark.operators.sessionize import session_bounds, sessionize
from feature_extractor_spark.operators.unwindow import unwindow
from feature_extractor_spark.operators.windows import sliding_windows


def test_sessionize_gap_flags(spark):
    base = dt.datetime(2024, 1, 1)
    # bursts: 0,1,2 min | 60,61 min | 300 min  (gap = 30 min)
    minutes = [0, 1, 2, 60, 61, 300]
    rows = [("u1", base + dt.timedelta(minutes=m), 1.0) for m in minutes]
    rows += [("u2", base, 1.0)]  # single event -> session 1
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")
    got = sessionize(df, "doc_id", "ts", gap_seconds=1800).orderBy("doc_id", "ts").collect()
    u1 = [r["session_id"] for r in got if r["doc_id"] == "u1"]
    assert u1 == [1, 1, 1, 2, 2, 3]
    u2 = [r["session_id"] for r in got if r["doc_id"] == "u2"]
    assert u2 == [1]


def test_session_bounds(spark):
    base = dt.datetime(2024, 1, 1)
    minutes = [0, 1, 2, 60, 61]
    rows = [("u1", base + dt.timedelta(minutes=m), 1.0) for m in minutes]
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")
    got = (
        session_bounds(df, "doc_id", "ts", gap_seconds=1800)
        .orderBy("session_id")
        .collect()
    )
    assert [r["n_events"] for r in got] == [3, 2]
    assert got[0]["session_start"] == base
    assert got[0]["session_end"] == base + dt.timedelta(minutes=2)


def test_unwindow_reconstructs_with_coverage_ramp(spark):
    """Window the identity series then unwindow: values come back exactly;
    coverage shows the 1..W ramp at the edges and W in the middle
    (reference ramp semantics, app/reconstruction.py:43-52)."""
    n, w = 10, 3
    base = dt.datetime(2024, 1, 1)
    rows = [("a", base + dt.timedelta(hours=i), float(i)) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")
    win = sliding_windows(df, "doc_id", "ts", ["value"], w)
    # window at ts=i covers absolute positions i-w+1 .. i
    from pyspark.sql import functions as F, Window as W

    idx = win.withColumn(
        "win_start",
        F.row_number().over(W.partitionBy("doc_id").orderBy("ts")) - 1,
    )
    rec = unwindow(idx, "doc_id", "win_start", "window").orderBy("abs_pos").collect()
    assert [r["reconstructed"] for r in rec] == [float(i) for i in range(n)]
    cov = [r["coverage"] for r in rec]
    assert cov == [1, 2, 3, 3, 3, 3, 3, 3, 2, 1]
