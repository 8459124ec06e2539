"""Deterministic encoder forward pass in pure NumPy (SURVEY.md §2.9 U1).

Mirrors the *shape* of the reference's ``vae_small`` inference network
(/root/reference/app/plugins/encoder_plugin_vae_small.py:80-235):

  inputs (x_window (B,W,F), h_prev (B,H), cond (B,C))
  -> repeat h/cond along time + concat             (ref :114-122)
  -> additive sin/cos positional encoding          (ref :15-28, :131-139)
  -> single-head self-attention + residual + LayerNorm (ref :141-157)
  -> strided linear downsample (conv stride 2)     (ref :162-178)
  -> tanh dense head on the last time step -> z_mean (ref :201-213 emit
     z_mean; inference is deterministic — saved encoder outputs z_mean,
     no sampling: /root/reference/app/data_processor.py:662-671)

TensorFlow is not available in this container, so the graph runs on seeded
float32 NumPy weights. The SAME function serves as the single-process oracle
(tests feed the full array at once) and as the distributed kernel (the Spark
stage feeds Arrow batches) — the parity test asserts batch-invariance and
allclose(rtol=1e-5), the tolerance the reference uses for its own save/load
round-trip (encoder_plugin_vae_small.py:322).
"""

from __future__ import annotations

import numpy as np

DTYPE = np.float32


def init_weights(
    window_size: int,
    n_features: int,
    rnn_hidden_dim: int = 4,
    conditioning_dim: int = 10,
    latent_dim: int = 8,
    d_model: int = 16,
    seed: int = 1234,
) -> dict[str, np.ndarray]:
    """Seeded float32 weights for the forward graph. Deterministic across
    platforms (PCG64 stream)."""
    rng = np.random.default_rng(seed)
    fin = n_features + rnn_hidden_dim + conditioning_dim

    def mat(*shape):
        return (rng.standard_normal(shape) / np.sqrt(shape[0])).astype(DTYPE)

    return {
        "meta": np.array(
            [window_size, n_features, rnn_hidden_dim, conditioning_dim, latent_dim, d_model],
            dtype=np.int64,
        ),
        "w_in": mat(fin, d_model),
        "b_in": np.zeros(d_model, dtype=DTYPE),
        "w_q": mat(d_model, d_model),
        "w_k": mat(d_model, d_model),
        "w_v": mat(d_model, d_model),
        "ln_g": np.ones(d_model, dtype=DTYPE),
        "ln_b": np.zeros(d_model, dtype=DTYPE),
        "w_conv": mat(2 * d_model, d_model),  # kernel 2, stride 2
        "b_conv": np.zeros(d_model, dtype=DTYPE),
        "w_mu": mat(d_model, latent_dim),
        "b_mu": np.zeros(latent_dim, dtype=DTYPE),
    }


def _positional_encoding(W: int, d: int) -> np.ndarray:
    pos = np.arange(W, dtype=DTYPE)[:, None]
    i = np.arange(d, dtype=DTYPE)[None, :]
    angle = pos / np.power(DTYPE(10000.0), (2 * (i // 2)) / DTYPE(d))
    pe = np.zeros((W, d), dtype=DTYPE)
    pe[:, 0::2] = np.sin(angle[:, 0::2])
    pe[:, 1::2] = np.cos(angle[:, 1::2])
    return pe


def _layernorm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return ((x - mu) / np.sqrt(var + DTYPE(1e-5))) * g + b


def _softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def encoder_forward(
    x: np.ndarray,  # (B, W, F) float32
    h: np.ndarray,  # (B, H) float32
    cond: np.ndarray,  # (B, C) float32
    weights: dict[str, np.ndarray],
) -> np.ndarray:
    """Returns z_mean (B, latent_dim) float32. Row-independent: the output
    of row i depends only on inputs of row i, so any batch split yields
    identical results (the property the Spark stage relies on)."""
    x = x.astype(DTYPE, copy=False)
    B, W, _ = x.shape
    h_rep = np.repeat(h.astype(DTYPE)[:, None, :], W, axis=1)
    c_rep = np.repeat(cond.astype(DTYPE)[:, None, :], W, axis=1)
    z = np.concatenate([x, h_rep, c_rep], axis=-1)  # (B, W, fin)

    z = z @ weights["w_in"] + weights["b_in"]  # (B, W, d)
    z = z + _positional_encoding(W, z.shape[-1])[None, :, :]

    q = z @ weights["w_q"]
    k = z @ weights["w_k"]
    v = z @ weights["w_v"]
    d = DTYPE(z.shape[-1])
    att = _softmax((q @ k.transpose(0, 2, 1)) / np.sqrt(d)) @ v
    z = _layernorm(z + att, weights["ln_g"], weights["ln_b"])

    # strided "conv": pairs of adjacent steps -> linear -> leaky relu
    W2 = W // 2
    z = z[:, : 2 * W2, :].reshape(B, W2, -1) @ weights["w_conv"] + weights["b_conv"]
    z = np.where(z > 0, z, DTYPE(0.2) * z)

    last = z[:, -1, :]  # point-in-time latent at the window's right edge
    z_mean = np.tanh(last @ weights["w_mu"] + weights["b_mu"])
    return z_mean.astype(DTYPE, copy=False)


def init_decoder_weights(
    latent_dim: int,
    n_features: int,
    d_model: int = 16,
    seed: int = 4321,
) -> dict[str, np.ndarray]:
    """Seeded float32 weights for the generative (decoder) network
    (SURVEY.md §2.9 U2; reference decoder contract
    /root/reference/app/autoencoder_manager.py:165-174)."""
    rng = np.random.default_rng(seed)

    def mat(*shape):
        return (rng.standard_normal(shape) / np.sqrt(shape[0])).astype(DTYPE)

    return {
        "w_up": mat(latent_dim, d_model),
        "b_up": np.zeros(d_model, dtype=DTYPE),
        "w_out": mat(d_model, n_features),
        "b_out": np.zeros(n_features, dtype=DTYPE),
    }


def decoder_forward(
    z: np.ndarray,  # (B, latent) float32
    weights: dict[str, np.ndarray],
) -> np.ndarray:
    """Mirror of the encoder tail: latent -> hidden (leaky relu) -> output
    features. The reference decoder emits the LAST time step only
    (decoder_plugin_vae_small.py:228-245), so this produces (B, F) —
    the point-in-time reconstruction."""
    h = z.astype(DTYPE, copy=False) @ weights["w_up"] + weights["b_up"]
    h = np.where(h > 0, h, DTYPE(0.2) * h)
    out = h @ weights["w_out"] + weights["b_out"]
    return out.astype(DTYPE, copy=False)
