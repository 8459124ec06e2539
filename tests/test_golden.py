"""Golden trained-weight models: pure-Python HDF5 reader + NumPy execution
of the reference's saved transformer AE
(/root/reference/tests/models/*_transformer_va.h5.keras).

Without TensorFlow in the container, parity is structural (every stored
weight consumed, shapes exactly matching the recovered model_config) and
behavioral (deterministic pinned outputs, batch invariance)."""

import os

import numpy as np
import pytest

GOLDEN = "/root/reference/tests/models/encoder_model_transformer_va.h5.keras"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference golden models not present"
)


def test_h5_reader_recovers_all_datasets():
    from feature_extractor_spark.encoder.h5_reader import read_h5

    h = read_h5(GOLDEN)
    assert len(h["datasets"]) == 20
    assert all(a.dtype == np.float32 for a in h["datasets"].values())
    root = h["attrs"]["/"]
    assert root["keras_version"].startswith("2.")
    assert root["backend"] == "tensorflow"
    assert '"class_name": "Functional"' in root["model_config"]


def test_keras_zip_format_loads(tmp_path):
    """Modern .keras zip (config.json + model.weights.h5): keras_weights
    must return the same layer/weight arrays as the raw-HDF5 path — a
    reference user's freshly saved save_format='keras' model loads too."""
    import zipfile

    from feature_extractor_spark.encoder.h5_reader import keras_weights

    legacy = keras_weights(GOLDEN)
    zpath = tmp_path / "model.keras"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("config.json", '{"class_name": "Functional"}')
        zf.writestr("metadata.json", '{"keras_version": "3.0.0"}')
        zf.write(GOLDEN, "model.weights.h5")
    ziploaded = keras_weights(str(zpath))
    assert ziploaded["__model_config__"] == '{"class_name": "Functional"}'
    legacy_layers = {k for k in legacy if k != "__model_config__"}
    zip_layers = {k for k in ziploaded if k != "__model_config__"}
    assert legacy_layers == zip_layers and legacy_layers
    for layer in legacy_layers:
        assert set(legacy[layer]) == set(ziploaded[layer])
        for name, arr in legacy[layer].items():
            np.testing.assert_array_equal(arr, ziploaded[layer][name])


def test_golden_encoder_weight_shapes_match_config():
    from feature_extractor_spark.encoder.golden import (
        EXPECTED_ENCODER_SHAPES,
        load_golden_encoder,
    )

    w = load_golden_encoder()
    for (layer, name), shape in EXPECTED_ENCODER_SHAPES.items():
        assert w[layer][name].shape == shape, (layer, name)


def test_golden_encoder_deterministic_and_batch_invariant():
    from feature_extractor_spark.encoder.golden import (
        golden_transformer_encode,
        load_golden_encoder,
    )

    w = load_golden_encoder()
    rng = np.random.default_rng(42)
    x = rng.uniform(0, 1, size=(9, 1, 8)).astype(np.float32)
    z = golden_transformer_encode(x, w)
    assert z.shape == (9, 16)
    z2 = golden_transformer_encode(x, w)
    np.testing.assert_array_equal(z, z2)  # fully deterministic
    parts = np.concatenate(
        [golden_transformer_encode(x[i : i + 1], w) for i in range(9)]
    )
    np.testing.assert_allclose(z, parts, rtol=1e-5, atol=1e-6)


def test_golden_output_checksum_pinned():
    """Guards the HDF5 reader + graph against silent regressions: the
    latent of a fixed input is pinned (computed once, stable across runs
    and batch splits because the graph is deterministic float32)."""
    from feature_extractor_spark.encoder.golden import (
        golden_transformer_encode,
        load_golden_encoder,
    )

    w = load_golden_encoder()
    x = np.full((1, 1, 8), 0.5, dtype=np.float32)
    z = golden_transformer_encode(x, w)[0]
    checksum = float(np.sum(z.astype(np.float64)))
    assert z.shape == (16,)
    PIN = -0.31341341882944107  # pinned on first green run
    assert abs(checksum - PIN) < 5e-4, checksum


def test_golden_roundtrip_shapes_and_stability():
    from feature_extractor_spark.encoder.golden import (
        golden_transformer_decode,
        golden_transformer_encode,
        load_golden_decoder,
        load_golden_encoder,
    )

    ew, dw = load_golden_encoder(), load_golden_decoder()
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, size=(16, 1, 8)).astype(np.float32)
    z = golden_transformer_encode(x, ew)
    rec = golden_transformer_decode(z, dw)
    assert rec.shape == (16, 1, 8)
    assert np.isfinite(rec).all()
