"""Fused window+encode must produce the same latents as the unfused
collect_list -> encode_stage path (allclose, reference tolerance)."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.encoder import encode_stage, init_weights
from feature_extractor_spark.functions.conditions import (
    cyclical_datetime_features,
    zero_context,
)
from feature_extractor_spark.operators.fused import windowed_encode
from feature_extractor_spark.operators.windows import sliding_windows

COND = ["sin_hour", "cos_hour", "sin_dow", "cos_dow", "sin_dom",
        "cos_dom", "sin_month", "cos_month", "sin_doy", "cos_doy"]


def _src(spark, n=300, entities=4):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for e in range(entities):
        # entity 0 is heavy: 4x the rows
        m = n * 4 if e == 0 else n
        for i in range(m):
            rows.append(
                (f"d{e}", base + dt.timedelta(minutes=3 * i),
                 float((i * 13 + e) % 97) / 97.0, float((i * 7 + e) % 31) / 31.0)
            )
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, f1 double, f2 double")
    return cyclical_datetime_features(df)


@pytest.mark.parametrize("rows_per_chunk", [64, 8192])
def test_fused_matches_unfused(spark, rows_per_chunk):
    W = 16
    src = _src(spark)
    weights = init_weights(window_size=W, n_features=2, rnn_hidden_dim=4,
                           conditioning_dim=10, latent_dim=8)

    fused = windowed_encode(
        src, "doc_id", "ts", ["f1", "f2"], COND, W, weights,
        rows_per_chunk=rows_per_chunk, rn_ts_chunk_seconds=3600,
    ).orderBy("doc_id", "ts").toPandas()

    win = sliding_windows(
        src.withColumn("fv", F.array("f1", "f2")), "doc_id", "ts", ["fv"], W,
        keep_cols=COND,
    )
    win = zero_context(win, 4)
    unfused = encode_stage(
        win, weights, cond_cols=COND, keep_cols=["doc_id", "ts"]
    ).orderBy("doc_id", "ts").toPandas()

    assert len(fused) == len(unfused) > 0
    assert fused["ts"].tolist() == unfused["ts"].tolist()
    za = np.asarray([np.asarray(v) for v in fused["z_mean"]])
    zb = np.asarray([np.asarray(v) for v in unfused["z_mean"]])
    assert np.allclose(za, zb, rtol=1e-5, atol=1e-6)


def test_fused_short_entities_dropped(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [("tiny", base + dt.timedelta(hours=i), float(i), 0.0) for i in range(5)]
    df = cyclical_datetime_features(
        spark.createDataFrame(rows, "doc_id string, ts timestamp, f1 double, f2 double")
    )
    weights = init_weights(window_size=8, n_features=2, latent_dim=8)
    out = windowed_encode(df, "doc_id", "ts", ["f1", "f2"], COND, 8, weights)
    assert out.count() == 0


def test_fused_instage_conditions_match_jvm_conditions(spark):
    """cond_cols=None (NumPy in-stage cyclical features) must equal the
    JVM-column conditioning path at reference tolerance."""
    W = 16
    src = _src(spark, n=100, entities=2)
    weights = init_weights(window_size=W, n_features=2, rnn_hidden_dim=4,
                           conditioning_dim=10, latent_dim=8)
    a = windowed_encode(
        src, "doc_id", "ts", ["f1", "f2"], COND, W, weights,
        rn_ts_chunk_seconds=3600,
    ).orderBy("doc_id", "ts").toPandas()
    b = windowed_encode(
        src, "doc_id", "ts", ["f1", "f2"], None, W, weights,
        rn_ts_chunk_seconds=3600,
    ).orderBy("doc_id", "ts").toPandas()
    za = np.asarray([np.asarray(v) for v in a["z_mean"]])
    zb = np.asarray([np.asarray(v) for v in b["z_mean"]])
    assert za.shape == zb.shape
    assert np.allclose(za, zb, rtol=1e-5, atol=1e-6)


def test_fused_heavy_keys_split_matches(spark):
    """heavy_keys routing (light whole-entity groups + heavy chunked) must
    equal the all-chunked path exactly."""
    W = 16
    src = _src(spark, n=120, entities=3)
    weights = init_weights(window_size=W, n_features=2, rnn_hidden_dim=4,
                           conditioning_dim=10, latent_dim=8)
    a = windowed_encode(
        src, "doc_id", "ts", ["f1", "f2"], None, W, weights,
        rows_per_chunk=64, rn_ts_chunk_seconds=3600,
    ).orderBy("doc_id", "ts").toPandas()
    b = windowed_encode(
        src, "doc_id", "ts", ["f1", "f2"], None, W, weights,
        rows_per_chunk=64, rn_ts_chunk_seconds=3600, heavy_keys=["d0"],
    ).orderBy("doc_id", "ts").toPandas()
    assert len(a) == len(b) > 0
    assert a["ts"].tolist() == b["ts"].tolist()
    za = np.asarray([np.asarray(v) for v in a["z_mean"]])
    zb = np.asarray([np.asarray(v) for v in b["z_mean"]])
    assert np.allclose(za, zb, rtol=1e-5, atol=1e-6)


def test_fused_with_vae_small_plugin(spark, sf_small):
    """The fused scale path accepts registry plugin forwards; vae_small
    sequence latents come out flattened and match the single-process graph
    on a spot-checked row."""
    import numpy as np
    from pyspark.sql import functions as F
    from feature_extractor_spark.encoder.plugins import init_vae_small
    from feature_extractor_spark.operators.fused import windowed_encode

    ev = spark.read.parquet(f"{sf_small}/events.parquet").select(
        F.col("user_id").cast("string").alias("doc_id"), "ts", "value"
    )
    w = init_vae_small(16, 1, 4, 10, latent_dim=8,
                       initial_conv_filters=32, lstm_units=8)
    z = windowed_encode(ev, "doc_id", "ts", ["value"], None, 16, w,
                        plugin="vae_small")
    first = z.first()
    assert len(first["z_mean"]) == 8  # T'(16/2^4=1) * latent(8)
    assert z.count() > 0
