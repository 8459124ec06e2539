"""Skew-proof scale paths must be semantically identical to the plain
per-entity paths: chunked window build and chunked (two-phase scan) LOCF."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.operators.asof import asof_join
from feature_extractor_spark.operators.windows import (
    sliding_windows,
    sliding_windows_chunked,
)


def _series(spark, n=200, entities=("a", "b")):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (e, base + dt.timedelta(hours=i), float(i) + (0.5 if e == "b" else 0.0))
        for e in entities
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")


@pytest.mark.parametrize("rows_per_chunk", [16, 33, 1000])
def test_chunked_windows_match_plain(spark, rows_per_chunk):
    df = _series(spark)
    w = 16
    plain = sliding_windows(df, "doc_id", "ts", ["value"], w)
    chunked = sliding_windows_chunked(
        df, "doc_id", "ts", ["value"], w, rows_per_chunk=rows_per_chunk
    )
    pa = plain.orderBy("doc_id", "ts").toPandas()
    pb = chunked.orderBy("doc_id", "ts").toPandas()
    assert len(pa) == len(pb) == 2 * (200 - w + 1)
    assert pa["ts"].tolist() == pb["ts"].tolist()
    for x, y in zip(pa["window"], pb["window"]):
        assert list(x) == list(y)


def test_chunked_windows_rejects_tiny_chunks(spark):
    df = _series(spark, n=20)
    with pytest.raises(ValueError, match="rows_per_chunk"):
        sliding_windows_chunked(df, "doc_id", "ts", ["value"], 8, rows_per_chunk=4)


def _asof_fixtures(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = dt.datetime(2024, 1, 1)
    left_rows, right_rows = [], []
    for k in ("a", "b", "c"):
        for t in sorted(rng.choice(50_000, size=300, replace=False)):
            left_rows.append((k, base + dt.timedelta(minutes=int(t)), float(t)))
        if k != "c":
            # sparse right side with long empty stretches (carry must cross
            # many empty chunks)
            for t in sorted(rng.choice(8_000, size=25, replace=False)):
                right_rows.append((k, base + dt.timedelta(minutes=int(t)), float(t) * 10))
    left = spark.createDataFrame(left_rows, "doc_id string, ts timestamp, lval double")
    right = spark.createDataFrame(right_rows, "doc_id string, ts timestamp, aux double")
    return left, right


@pytest.mark.parametrize("chunk_seconds", [3600, 86400])
@pytest.mark.parametrize("tolerance", [None, 36000])
def test_chunked_locf_matches_plain(spark, chunk_seconds, tolerance):
    left, right = _asof_fixtures(spark)
    plain = (
        asof_join(left, right, on="ts", by="doc_id", tolerance_seconds=tolerance)
        .orderBy("doc_id", "ts")
        .toPandas()
    )
    chunked = (
        asof_join(
            left, right, on="ts", by="doc_id", tolerance_seconds=tolerance,
            strategy="union_locf_chunked", chunk_seconds=chunk_seconds,
        )
        .orderBy("doc_id", "ts")
        .toPandas()
    )
    pd.testing.assert_frame_equal(plain, chunked)


def _skewed(spark, n_heavy=3000, n_light=50, n_entities=20):
    base = dt.datetime(2024, 1, 1)
    rows = [("heavy", base + dt.timedelta(minutes=i), float(i)) for i in range(n_heavy)]
    for e in range(n_entities):
        rows += [
            (f"light_{e}", base + dt.timedelta(minutes=7 * i), float(i) * 2)
            for i in range(n_light)
        ]
    return spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")


def test_auto_windows_match_plain_on_skew(spark):
    from feature_extractor_spark.operators.windows import sliding_windows_auto

    df = _skewed(spark)
    w = 16
    plain = sliding_windows(df, "doc_id", "ts", ["value"], w)
    auto = sliding_windows_auto(df, "doc_id", "ts", ["value"], w, target_chunks=16)
    pa = plain.orderBy("doc_id", "ts").toPandas()
    pb = auto.orderBy("doc_id", "ts").toPandas()
    assert len(pa) == len(pb)
    assert pa["ts"].tolist() == pb["ts"].tolist()
    for x, y in zip(pa["window"], pb["window"]):
        assert list(x) == list(y)


def test_scan_row_numbers_match_global(spark):
    from feature_extractor_spark.operators.windows import _scan_row_numbers
    from pyspark.sql import Window as W

    df = _skewed(spark, n_heavy=500, n_light=30, n_entities=5)
    got = _scan_row_numbers(df, "doc_id", "ts", ts_chunk_seconds=3600)
    w = W.partitionBy("doc_id").orderBy("ts")
    exp = df.withColumn("__rn_exp", F.row_number().over(w) - 1)
    joined = got.join(exp, ["doc_id", "ts", "value"])
    assert joined.filter(F.col("__rn") != F.col("__rn_exp")).count() == 0
    assert joined.count() == df.count()


def test_auto_asof_matches_plain_on_skew(spark):
    df = _skewed(spark)
    right = df.filter(F.col("value") % 5 == 0).select(
        "doc_id", "ts", (F.col("value") * 10).alias("aux")
    )
    plain = asof_join(df, right, on="ts", by="doc_id").orderBy("doc_id", "ts").toPandas()
    auto = (
        asof_join(df, right, on="ts", by="doc_id", strategy="auto")
        .orderBy("doc_id", "ts")
        .toPandas()
    )
    pd.testing.assert_frame_equal(plain, auto)


def test_salted_join_equals_plain_join(spark):
    """salted_join == plain join on Zipf-skewed data, for inner and left,
    with and without heavy-key targeting."""
    from pyspark.sql import functions as F

    from feature_extractor_spark.operators.skew import salted_join

    left = spark.range(2000).select(
        F.when(F.col("id") % 3 == 0, F.lit("heavy"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(300).select(
        F.when(F.col("id") % 4 == 0, F.lit("heavy"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 60).cast("string")))
        .alias("k"),
        F.col("id").alias("rv"),
    )
    exp_inner = left.join(right, "k").groupBy("k").count()
    got_inner = (
        salted_join(left, right, "k", heavy_keys=["heavy"], salt_buckets=8)
        .groupBy("k")
        .count()
    )
    assert got_inner.exceptAll(exp_inner).count() == 0
    assert exp_inner.exceptAll(got_inner).count() == 0

    exp_left = left.join(right, "k", "left").groupBy("k").count()
    got_left = (
        salted_join(left, right, "k", heavy_keys=["heavy"], how="left", salt_buckets=8)
        .groupBy("k")
        .count()
    )
    assert got_left.exceptAll(exp_left).count() == 0
    assert exp_left.exceptAll(got_left).count() == 0

    # salt-everything mode (small right side)
    got_all = salted_join(left, right, "k", salt_buckets=4).groupBy("k").count()
    assert got_all.exceptAll(exp_inner).count() == 0
    assert exp_inner.exceptAll(got_all).count() == 0


def test_salt_is_deterministic_across_evaluations(spark):
    """The salt must be a pure function of row content so a retried map
    task re-emits identical (key, salt) pairs. monotonically_increasing_id
    / rand() salts are forbidden: a lost-map-task recompute would reshuffle
    rows to different (key, salt) partitions after some reducers already
    fetched, silently duplicating or dropping rows. Evidence: evaluating
    the SAME salted plan twice (second run cannot reuse the first's
    shuffle files once we vary the action) yields identical per-row salt
    assignments, and the salt depends only on the salt_from columns."""
    from pyspark.sql import functions as F

    from feature_extractor_spark.operators.skew import (
        _content_salt,
        salted_repartition,
    )

    df = spark.range(5000).select(
        F.concat(F.lit("d"), (F.col("id") % 7).cast("string")).alias("doc_id"),
        F.col("id").alias("ts"),
        (F.col("id") * 2).cast("double").alias("v"),
    )
    salted = salted_repartition(df, "doc_id", salt_buckets=8, salt_from=["ts"])
    a = salted.select("doc_id", "ts", "__salt").orderBy("doc_id", "ts").collect()
    b = salted.select("doc_id", "ts", "__salt").orderBy("doc_id", "ts").collect()
    assert a == b
    # recomputing from a fresh, differently-partitioned copy of the same
    # rows (simulating a retry that re-reads the source) gives the same salt
    fresh = df.repartition(13).withColumn(
        "__salt", _content_salt(df, 8, ["ts"])
    )
    c = fresh.select("doc_id", "ts", "__salt").orderBy("doc_id", "ts").collect()
    assert a == c
    # every bucket is actually used (the salt does spread rows)
    used = {r["__salt"] for r in a}
    assert used == set(range(8))
