"""A8 best-model argmin loop (reference data_processor.py:228-395):
distributed validation MAE per candidate, argmin selection, threshold
early-stop, step/cap control flow, single-iteration mode, NaN quirks."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.operators.windows import sliding_windows
from feature_extractor_spark.plans import model_search as MS


@pytest.fixture(scope="module")
def win(spark):
    rows = [
        ("e%d" % (i % 3), float(i), i)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id string, value double, k int")
    df = df.withColumn(
        "ts", F.timestamp_seconds(F.col("k") * 60).cast("timestamp_ntz")
    )
    return sliding_windows(df, "doc_id", "ts", ["value"], 8)


def test_validation_mae_matches_local_numpy(spark, win):
    """The distributed MAE equals the single-process forward computed on
    the collected windows (allclose — float32 GEMM)."""
    from feature_extractor_spark.encoder import init_vae_small, init_vae_small_decoder
    from feature_extractor_spark.encoder.plugins import vae_small_decode, vae_small_seq

    mae = MS.validation_mae(
        win, latent_dim=4, window_size=8, n_features=1,
        initial_conv_filters=16, lstm_units=4, num_conv_layers=2, seed=7,
    )
    src = win.orderBy("doc_id", "ts").toPandas()
    x = np.asarray([np.asarray(v, dtype=np.float32) for v in src["window"]])[:, :, None]
    h = np.zeros((len(x), 4), dtype=np.float32)
    cond = np.zeros((len(x), 0), dtype=np.float32)
    enc_w = init_vae_small(
        window_size=8, n_features=1, rnn_hidden_dim=4, conditioning_dim=0,
        latent_dim=4, initial_conv_filters=16, lstm_units=4, num_conv_layers=2, seed=7,
    )
    dec_w = init_vae_small_decoder(
        window_size=8, latent_dim=4, output_feature_dim=1, rnn_hidden_dim=4,
        conditioning_dim=0, initial_conv_filters=16, num_conv_layers=2, seed=8,
    )
    z_mean, _ = vae_small_seq(x, h, cond, enc_w)
    rec = vae_small_decode(z_mean, h, cond, dec_w)
    expected = float(np.mean(np.abs(rec[:, 0] - x[:, -1, 0])))
    # float32 GEMM is batch-size dependent (memory: never array_equal);
    # distributed batches differ from the one-shot local forward
    assert mae == pytest.approx(expected, rel=1e-3)


def test_search_runs_all_candidates_and_picks_argmin(spark, win):
    res = MS.incremental_latent_search(
        win, window_size=8, n_features=1,
        initial_latent_dim=2, step_size_latent=2, max_latent_dim=6,
        threshold_error=0.0, initial_conv_filters=16, lstm_units=4, num_conv_layers=2,
    )
    dims = [d for d, _ in res["candidates"]]
    assert dims == [2, 4, 6]
    maes = dict(res["candidates"])
    assert res["best_val_mae"] == min(maes.values())
    assert maes[res["best_latent_dim"]] == res["best_val_mae"]


def test_search_threshold_early_stop(spark, win):
    res = MS.incremental_latent_search(
        win, window_size=8, n_features=1,
        initial_latent_dim=2, step_size_latent=2, max_latent_dim=64,
        threshold_error=1e9, initial_conv_filters=16, lstm_units=4, num_conv_layers=2,
    )
    assert len(res["candidates"]) == 1  # first candidate met the threshold


def test_search_disabled_single_iteration(spark, win):
    res = MS.incremental_latent_search(
        win, window_size=8, n_features=1,
        initial_latent_dim=6, step_size_latent=2, max_latent_dim=64,
        incremental_search=False, initial_conv_filters=16, lstm_units=4, num_conv_layers=2,
    )
    assert len(res["candidates"]) == 1
    assert res["best_latent_dim"] == 6


def test_search_nan_mae_keeps_first_model(spark):
    """Empty validation frame -> avg() is NULL -> NaN MAE: the first
    candidate is retained as best (reference :348-351) and the search
    stops stepping only via cap; best_val_mae reports NaN."""
    empty = sliding_windows(
        sparkify_empty(), "doc_id", "ts", ["value"], 8
    )
    res = MS.incremental_latent_search(
        empty, window_size=8, n_features=1,
        initial_latent_dim=2, step_size_latent=2, max_latent_dim=4,
        initial_conv_filters=16, lstm_units=4, num_conv_layers=2,
    )
    assert res["best_latent_dim"] == 2
    assert math.isnan(res["best_val_mae"])


_spark_ref = None


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    global _spark_ref
    _spark_ref = spark
    yield


def sparkify_empty():
    return _spark_ref.createDataFrame(
        [], "doc_id string, ts timestamp_ntz, value double"
    )
