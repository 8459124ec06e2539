"""U1 encoder forward-stage parity: allclose vs single-process oracle,
batch-invariance across partition boundaries, zero leakage via last-step."""

import datetime as dt

import numpy as np

from feature_extractor_spark.encoder.forward import encoder_forward, init_weights
from feature_extractor_spark.encoder.stage import encode_stage
from feature_extractor_spark.functions.conditions import (
    cyclical_datetime_features,
    zero_context,
)
from feature_extractor_spark.operators.windows import sliding_windows

COND_COLS = [
    "sin_hour", "cos_hour", "sin_dow", "cos_dow", "sin_dom",
    "cos_dom", "sin_month", "cos_month", "sin_doy", "cos_doy",
]


def _pipeline(spark, n=64, w=8, n_entities=3):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for e in range(n_entities):
        for i in range(n):
            rows.append(
                (f"doc_{e}", base + dt.timedelta(hours=i), float((i * 7 + e * 13) % 29) / 29.0)
            )
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")
    win = sliding_windows(df, "doc_id", "ts", ["value"], w)
    win = cyclical_datetime_features(win)
    win = zero_context(win, 4)
    return win


def test_encoder_stage_allclose_vs_oracle(spark):
    w_size, latent = 8, 6
    weights = init_weights(
        window_size=w_size, n_features=1, rnn_hidden_dim=4,
        conditioning_dim=10, latent_dim=latent,
    )
    win = _pipeline(spark, w=w_size)
    out = encode_stage(
        win, weights, window_col="window", h_col="h_context",
        cond_cols=COND_COLS, keep_cols=["doc_id", "ts"],
    )
    got = out.orderBy("doc_id", "ts").toPandas()
    assert got["z_mean"].map(len).eq(latent).all()

    # single-process oracle: whole dataset through the same graph at once
    src = win.orderBy("doc_id", "ts").toPandas()
    x = np.asarray([np.asarray(v, dtype=np.float32) for v in src["window"]])[:, :, None]
    h = np.asarray([np.asarray(v, dtype=np.float32) for v in src["h_context"]])
    cond = src[COND_COLS].to_numpy(dtype=np.float32)
    exp = encoder_forward(x, h, cond, weights)

    got_z = np.asarray([np.asarray(v) for v in got["z_mean"]])
    assert np.allclose(got_z, exp, rtol=1e-5, atol=1e-6)


def test_encoder_batch_invariance(spark):
    """Different partitioning must not change any latent vector."""
    w_size = 8
    weights = init_weights(window_size=w_size, n_features=1, latent_dim=6)
    win = _pipeline(spark, w=w_size)
    a = encode_stage(
        win.repartition(1), weights, cond_cols=COND_COLS, keep_cols=["doc_id", "ts"]
    ).orderBy("doc_id", "ts").toPandas()
    b = encode_stage(
        win.repartition(16), weights, cond_cols=COND_COLS, keep_cols=["doc_id", "ts"]
    ).orderBy("doc_id", "ts").toPandas()
    za = np.asarray([np.asarray(v) for v in a["z_mean"]])
    zb = np.asarray([np.asarray(v) for v in b["z_mean"]])
    # float32 GEMM blocking differs with batch size -> ULP-level wiggle;
    # the reference's own parity tolerance is rtol=1e-5
    # (encoder_plugin_vae_small.py:322), so that's the gate here too.
    assert np.allclose(za, zb, rtol=1e-5, atol=1e-7)


def test_z_log_var_surface(spark):
    """The full reference encoder contract (z_mean, z_log_var) through the
    distributed stage: both heads allclose vs the single-process graph,
    and the stage without log_var_col emits the identical z_mean."""
    import pytest

    from feature_extractor_spark.encoder.plugins import (
        get_encoder_full,
        init_vae_small,
        vae_small_seq,
    )

    w_size = 8
    weights = init_vae_small(
        window_size=w_size, n_features=1, rnn_hidden_dim=4,
        conditioning_dim=10, latent_dim=4,
        initial_conv_filters=16, lstm_units=4, num_conv_layers=2,
    )
    win = _pipeline(spark, w=w_size)
    out = encode_stage(
        win, weights, cond_cols=COND_COLS, keep_cols=["doc_id", "ts"],
        plugin="vae_small", log_var_col="z_log_var",
    ).orderBy("doc_id", "ts").toPandas()
    assert set(out.columns) >= {"z_mean", "z_log_var"}

    src = win.orderBy("doc_id", "ts").toPandas()
    x = np.asarray([np.asarray(v, dtype=np.float32) for v in src["window"]])[:, :, None]
    h = np.asarray([np.asarray(v, dtype=np.float32) for v in src["h_context"]])
    cond = src[COND_COLS].to_numpy(dtype=np.float32)
    zm, zlv = vae_small_seq(x, h, cond, weights)
    B = len(zm)
    got_zm = np.asarray([np.asarray(v) for v in out["z_mean"]])
    got_zlv = np.asarray([np.asarray(v) for v in out["z_log_var"]])
    assert np.allclose(got_zm, zm.reshape(B, -1), rtol=1e-5, atol=1e-6)
    assert np.allclose(got_zlv, zlv.reshape(B, -1), rtol=1e-5, atol=1e-6)

    single = encode_stage(
        win, weights, cond_cols=COND_COLS, keep_cols=["doc_id", "ts"],
        plugin="vae_small",
    ).orderBy("doc_id", "ts").toPandas()
    z_single = np.asarray([np.asarray(v) for v in single["z_mean"]])
    assert np.allclose(got_zm, z_single, rtol=1e-5, atol=1e-7)

    # plugins without a log-var head refuse the surface explicitly
    with pytest.raises(KeyError):
        get_encoder_full("cnn")


def test_encoder_deterministic_weights():
    w1 = init_weights(8, 1, latent_dim=6, seed=99)
    w2 = init_weights(8, 1, latent_dim=6, seed=99)
    for k in w1:
        assert np.array_equal(w1[k], w2[k])


def test_pruned_forward_equals_full_graph():
    """encoder_forward prunes attention/LN/conv to the two positions the
    head reads; outputs must match the unpruned graph."""
    import numpy as np
    from feature_extractor_spark.encoder.forward import (
        encoder_forward,
        encoder_forward_full,
        init_weights,
    )

    rng = np.random.default_rng(123)
    for W, F, H, C in [(8, 1, 4, 10), (48, 3, 4, 10), (9, 2, 0, 0), (16, 2, 4, 0)]:
        w = init_weights(W, F, rnn_hidden_dim=H, conditioning_dim=C,
                         latent_dim=8, d_model=16)
        x = rng.standard_normal((7, W, F)).astype(np.float32)
        h = rng.standard_normal((7, H)).astype(np.float32)
        c = rng.standard_normal((7, C)).astype(np.float32)
        a = encoder_forward(x, h, c, w)
        b = encoder_forward_full(x, h, c, w)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
