"""NumPy inference implementations of the Keras layers the reference's
plugin architectures are built from (SURVEY.md §2.9 U1-U3).

TensorFlow is not available in this container, so each layer reproduces the
exact *inference-time* math of its Keras counterpart (same padding rules,
same gate order, same epsilon defaults) on float32 NumPy arrays. Layouts
match Keras weight shapes so golden weights could be dropped in:

- Dense kernel (d_in, d_out)
- Conv1D kernel (k, c_in, c_out)                    [reference convs]
- Conv1DTranspose kernel (k, c_out, c_in)
- MultiHeadAttention kernels (d, H, key_dim) / output (H, key_dim, d)
- LSTM kernel (d, 4u), recurrent (u, 4u), bias (4u,); gate order i,f,c,o
- LayerNormalization epsilon=1e-3 (Keras default), BatchNormalization
  epsilon=1e-3 (Keras default)

All functions are row-independent across the batch axis: output row i
depends only on input row i, the property the distributed encode stage
relies on (any Arrow batch split yields identical results).
"""

from __future__ import annotations

import numpy as np

DTYPE = np.float32


def leaky_relu(x: np.ndarray, alpha: float = 0.2) -> np.ndarray:
    return np.where(x > 0, x, DTYPE(alpha) * x)


ACTIVATIONS = {
    None: lambda x: x,
    "linear": lambda x: x,
    "tanh": np.tanh,
    "relu": lambda x: np.maximum(x, DTYPE(0)),
    "leaky_relu": leaky_relu,
    "sigmoid": lambda x: DTYPE(1) / (DTYPE(1) + np.exp(-x)),
}


def dense(x: np.ndarray, w: np.ndarray, b: np.ndarray, act=None) -> np.ndarray:
    """Dense / TimeDistributed(Dense): broadcasting matmul over leading dims."""
    out = x @ w + b
    return ACTIVATIONS[act](out) if isinstance(act, (str, type(None))) else act(out)


def positional_encoding_concat(W: int, d: int) -> np.ndarray:
    """The reference's positional encoding (encoder_plugin_vae_small.py:15-28):
    angle(pos, i) = pos / 10000^(2*(i//2)/d); output = CONCAT([sin of even
    columns, cos of odd columns]) — concatenated halves, NOT interleaved."""
    pos = np.arange(W, dtype=DTYPE)[:, None]
    i = np.arange(d, dtype=DTYPE)[None, :]
    angle = pos / np.power(DTYPE(10000.0), (2 * (i // 2)) / DTYPE(d))
    sines = np.sin(angle[:, 0::2])
    cosines = np.cos(angle[:, 1::2])
    return np.concatenate([sines, cosines], axis=-1).astype(DTYPE)  # (W, d)


def _same_pad(n: int, k: int, s: int) -> tuple[int, int, int]:
    """TF 'same' padding: out = ceil(n/s); pad split low-left/high-right."""
    out = -(-n // s)
    total = max((out - 1) * s + k - n, 0)
    left = total // 2
    return out, left, total - left


def conv1d_same(x: np.ndarray, kernel: np.ndarray, bias: np.ndarray,
                stride: int = 1, act=None) -> np.ndarray:
    """Conv1D(padding='same'). x (B, T, Cin), kernel (k, Cin, Cout)."""
    B, T, Cin = x.shape
    k = kernel.shape[0]
    out_t, pl, pr = _same_pad(T, k, stride)
    xp = np.pad(x, ((0, 0), (pl, pr), (0, 0)))
    # window view (B, out_t, k, Cin): positions t*stride .. t*stride+k-1
    v = np.lib.stride_tricks.sliding_window_view(xp, k, axis=1)  # (B, T', Cin, k)
    v = v[:, ::stride, :, :]  # stride
    out = np.einsum("btck,kcf->btf", v[:, :out_t], kernel) + bias
    out = out.astype(DTYPE, copy=False)
    return ACTIVATIONS[act](out)


def conv1d_transpose_same(x: np.ndarray, kernel: np.ndarray, bias: np.ndarray,
                          stride: int = 2, act=None) -> np.ndarray:
    """Conv1DTranspose(padding='same'): out length = T*stride. x (B, T, Cin),
    kernel (k, Cout, Cin) — Keras transpose layout. Adjoint of the forward
    'same' conv mapping T*stride -> T, i.e. out[i*s + j - pad_left] +=
    x[i] @ kernel[j].T."""
    B, T, Cin = x.shape
    k, Cout, _ = kernel.shape
    L = T * stride
    _, pl, _ = _same_pad(L, k, stride)
    out = np.zeros((B, L + k, Cout), dtype=DTYPE)  # slack tail, trimmed below
    base = np.arange(T) * stride - pl
    for j in range(k):
        t = base + j
        valid = (t >= 0) & (t < L)
        if not valid.any():
            continue
        contrib = x[:, valid, :] @ kernel[j].T  # (B, n_valid, Cout)
        np.add.at(out, (slice(None), t[valid]), contrib)
    out = out[:, :L, :] + bias
    out = out.astype(DTYPE, copy=False)
    return ACTIVATIONS[act](out)


def layer_norm(x: np.ndarray, gamma: np.ndarray, beta: np.ndarray,
               eps: float = 1e-3) -> np.ndarray:
    """Keras LayerNormalization (default epsilon=1e-3), last axis."""
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (((x - mu) / np.sqrt(var + DTYPE(eps))) * gamma + beta).astype(
        DTYPE, copy=False
    )


def batch_norm_inference(x: np.ndarray, gamma: np.ndarray, beta: np.ndarray,
                         moving_mean: np.ndarray, moving_var: np.ndarray,
                         eps: float = 1e-3) -> np.ndarray:
    """Keras BatchNormalization at inference (default epsilon=1e-3):
    normalizes with the MOVING statistics, never the batch's."""
    return (
        (x - moving_mean) / np.sqrt(moving_var + DTYPE(eps)) * gamma + beta
    ).astype(DTYPE, copy=False)


def _softmax_last(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def mha(x: np.ndarray, w: dict, prefix: str = "") -> np.ndarray:
    """Keras MultiHeadAttention with query=key=value=x (self-attention).

    Weights (Keras layout): {prefix}wq/wk/wv (d, H, key_dim), bq/bk/bv
    (H, key_dim), wo (H, key_dim, d), bo (d,). Scores scaled by
    1/sqrt(key_dim), softmax over the key axis."""
    q = np.einsum("btd,dhk->bhtk", x, w[f"{prefix}wq"]) + w[f"{prefix}bq"][None, :, None, :]
    kk = np.einsum("btd,dhk->bhtk", x, w[f"{prefix}wk"]) + w[f"{prefix}bk"][None, :, None, :]
    v = np.einsum("btd,dhk->bhtk", x, w[f"{prefix}wv"]) + w[f"{prefix}bv"][None, :, None, :]
    key_dim = q.shape[-1]
    scores = np.einsum("bhtk,bhsk->bhts", q, kk) / np.sqrt(DTYPE(key_dim))
    att = _softmax_last(scores.astype(DTYPE, copy=False))
    ctx = np.einsum("bhts,bhsk->bhtk", att, v)
    out = np.einsum("bhtk,hkd->btd", ctx, w[f"{prefix}wo"]) + w[f"{prefix}bo"]
    return out.astype(DTYPE, copy=False)


def lstm_seq(x: np.ndarray, kernel: np.ndarray, recurrent: np.ndarray,
             bias: np.ndarray) -> np.ndarray:
    """Keras LSTM(return_sequences=True), activation=tanh,
    recurrent_activation=sigmoid, gate order [i, f, c, o]. x (B, T, d) ->
    (B, T, u). Sequential over T (inherent), vectorized over B."""
    B, T, _ = x.shape
    u = recurrent.shape[0]
    h = np.zeros((B, u), dtype=DTYPE)
    c = np.zeros((B, u), dtype=DTYPE)
    # hoist the input projection: one big GEMM instead of T small ones
    zx = x.reshape(B * T, -1) @ kernel
    zx = zx.reshape(B, T, 4 * u) + bias
    out = np.empty((B, T, u), dtype=DTYPE)
    sig = ACTIVATIONS["sigmoid"]
    for t in range(T):
        z = zx[:, t, :] + h @ recurrent
        i = sig(z[:, :u])
        f = sig(z[:, u : 2 * u])
        g = np.tanh(z[:, 2 * u : 3 * u])
        o = sig(z[:, 3 * u :])
        c = f * c + i * g
        h = (o * np.tanh(c)).astype(DTYPE, copy=False)
        out[:, t, :] = h
    return out


def bilstm(x: np.ndarray, w: dict, prefix: str = "") -> np.ndarray:
    """Bidirectional(LSTM(..., return_sequences=True)), merge_mode='concat'
    (Keras default): forward over t=0..T-1, backward over reversed input
    with outputs re-reversed, concat on features -> (B, T, 2u)."""
    fw = lstm_seq(x, w[f"{prefix}fw_k"], w[f"{prefix}fw_r"], w[f"{prefix}fw_b"])
    bw = lstm_seq(x[:, ::-1, :], w[f"{prefix}bw_k"], w[f"{prefix}bw_r"], w[f"{prefix}bw_b"])
    return np.concatenate([fw, bw[:, ::-1, :]], axis=-1)


def avg_pool1d_same(x: np.ndarray, pool: int = 3, stride: int = 2) -> np.ndarray:
    """Keras AveragePooling1D(padding='same'): out = ceil(T/stride); padded
    positions are EXCLUDED from the mean (TF divides by the count of real
    elements in the window, not by pool)."""
    B, T, C = x.shape
    out_t, pl, pr = _same_pad(T, pool, stride)
    xp = np.pad(x, ((0, 0), (pl, pr), (0, 0)))
    ones = np.pad(np.ones((T,), dtype=DTYPE), (pl, pr))
    v = np.lib.stride_tricks.sliding_window_view(xp, pool, axis=1)[:, ::stride]
    n = np.lib.stride_tricks.sliding_window_view(ones, pool)[::stride]
    sums = v[:, :out_t].sum(axis=-1)
    counts = n[:out_t].sum(axis=-1)[None, :, None]
    return (sums / counts).astype(DTYPE, copy=False)


# ---------------------------------------------------------------------------
# Seeded weight constructors (Keras layouts; deterministic PCG64 streams)


def glorot(rng, *shape) -> np.ndarray:
    fan_in, fan_out = shape[0], shape[-1]
    lim = np.sqrt(6.0 / (fan_in + fan_out))
    return rng.uniform(-lim, lim, size=shape).astype(DTYPE)


def he_normal(rng, *shape) -> np.ndarray:
    fan_in = int(np.prod(shape[:-1]))
    return (rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)).astype(DTYPE)


def mha_weights(rng, d: int, heads: int, key_dim: int, prefix: str = "") -> dict:
    w = {}
    for name in ("wq", "wk", "wv"):
        w[f"{prefix}{name}"] = glorot(rng, d, heads, key_dim)
    for name in ("bq", "bk", "bv"):
        w[f"{prefix}{name}"] = np.zeros((heads, key_dim), dtype=DTYPE)
    w[f"{prefix}wo"] = glorot(rng, heads, key_dim, d)
    w[f"{prefix}bo"] = np.zeros(d, dtype=DTYPE)
    return w


def lstm_weights(rng, d: int, u: int, prefix: str = "") -> dict:
    # Keras: kernel Glorot, recurrent orthogonal-ish (seeded normal here —
    # we reproduce the architecture, not a trained model), bias zeros with
    # unit_forget_bias (f-gate bias = 1, Keras default)
    b = np.zeros(4 * u, dtype=DTYPE)
    b[u : 2 * u] = 1.0
    return {
        f"{prefix}k": glorot(rng, d, 4 * u),
        f"{prefix}r": (rng.standard_normal((u, 4 * u)) / np.sqrt(u)).astype(DTYPE),
        f"{prefix}b": b,
    }


def bilstm_weights(rng, d: int, u: int, prefix: str = "") -> dict:
    w = {}
    w.update(lstm_weights(rng, d, u, prefix=f"{prefix}fw_"))
    w.update(lstm_weights(rng, d, u, prefix=f"{prefix}bw_"))
    return w
