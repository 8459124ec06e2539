"""A8: incremental latent-dim search / best-model argmin loop.

Reference (/root/reference/app/data_processor.py:228-395): starting from
``initial_latent_dim``, train a CVAE per candidate, compute validation MAE,
keep the argmin (``best_val_mae``/``best_latent_dim``), early-stop when the
MAE meets ``threshold_error``, else step ``latent_dim`` by
``step_size_latent`` until ``max_latent_dim``; with
``incremental_search=False`` exactly one candidate runs. Selection quirks
kept: a NaN validation MAE never beats a real one, but the first model is
retained as best when no validation MAE exists (:341-351), and with search
disabled the single model is selected regardless (:354-359).

Spark-first shape: *training* is out of engine scope (SURVEY §7 — no TF in
this stack); the engine's loop evaluates DETERMINISTIC seeded candidate
weights (the same stand-in the rest of the encoder stack uses) with a fully
distributed validation pass per candidate: encode_stage -> decode_seq_stage
-> per-row |reconstruction - last-step target| via built-in zip_with /
aggregate expressions -> one avg() scalar. The driver loop is control flow
only (the reference's loop is inherently sequential — each step decides
whether to continue); each iteration is one Spark job over the SAME cached
validation windows, so the per-candidate cost is the forward pass, not the
window build. At scale: candidates are usually <=10; if all candidates are
known up front (threshold_error=0), they could be evaluated in a single job
by stacking weight sets — not done here to preserve the reference's
early-stop semantics.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_mae(rec_col: str, tgt_col: str):
    """Per-row mean absolute error between two equal-length float arrays —
    pure built-ins (zip_with + aggregate), JVM-side."""
    diffs = F.zip_with(
        F.col(rec_col), F.col(tgt_col), lambda a, b: F.abs(a - b).cast("double")
    )
    total = F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
    return total / F.size(diffs)


def validation_mae(
    win_df: DataFrame,
    latent_dim: int,
    window_size: int,
    n_features: int,
    cond_cols: list[str] | None = None,
    rnn_hidden_dim: int = 4,
    initial_conv_filters: int = 32,
    lstm_units: int = 8,
    num_conv_layers: int = 4,
    window_col: str = "window",
    seed: int = 7,
) -> float:
    """Distributed reconstruction val-MAE for one candidate ``latent_dim``:
    encode -> decode -> mean over rows of mean |rec - last-step target|.
    The target is the window's last time step (reference
    data_processor.py:86-102: y = x[:, -1, target_indices]; the vae_small
    decoder emits exactly the last-step reconstruction)."""
    from feature_extractor_spark.encoder import (
        encode_stage,
        init_vae_small,
        init_vae_small_decoder,
    )
    from feature_extractor_spark.encoder.stage import decode_seq_stage

    cond_cols = cond_cols or []
    enc_w = init_vae_small(
        window_size=window_size,
        n_features=n_features,
        rnn_hidden_dim=rnn_hidden_dim,
        conditioning_dim=len(cond_cols),
        latent_dim=latent_dim,
        initial_conv_filters=initial_conv_filters,
        lstm_units=lstm_units,
        num_conv_layers=num_conv_layers,
        seed=seed,
    )
    dec_w = init_vae_small_decoder(
        window_size=window_size,
        latent_dim=latent_dim,
        output_feature_dim=n_features,
        rnn_hidden_dim=rnn_hidden_dim,
        conditioning_dim=len(cond_cols),
        initial_conv_filters=initial_conv_filters,
        num_conv_layers=num_conv_layers,
        seed=seed + 1,
    )
    # last-step target: the final n_features entries of the flat W*F window
    tgt = F.slice(
        F.col(window_col), window_size * n_features - n_features + 1, n_features
    )
    win = win_df.withColumn("__tgt", F.transform(tgt, lambda v: v.cast("float")))
    z = encode_stage(
        win, enc_w, cond_cols=cond_cols, keep_cols=["__tgt"], plugin="vae_small"
    )
    rec = decode_seq_stage(z, dec_w, keep_cols=["__tgt"])
    row = rec.agg(F.avg(_row_mae("reconstruction", "__tgt")).alias("mae")).first()
    mae = row["mae"]
    return float("nan") if mae is None else float(mae)


def incremental_latent_search(
    win_df: DataFrame,
    window_size: int,
    n_features: int,
    cond_cols: list[str] | None = None,
    initial_latent_dim: int = 4,
    step_size_latent: int = 4,
    threshold_error: float = 0.0,
    max_latent_dim: int = 256,
    incremental_search: bool = True,
    cache: bool = True,
    **candidate_kwargs,
) -> dict:
    """A8 loop with the reference's exact control flow
    (data_processor.py:228-395). Returns
    ``{"best_latent_dim", "best_val_mae", "candidates": [(dim, mae), ...]}``.

    ``win_df`` is the VALIDATION window frame (build it with
    sliding_windows over the validation ts-range split, O4). It is cached
    across candidates and unpersisted before returning.
    """
    cached = win_df.persist() if cache else win_df
    best_val_mae = float("inf")
    best_latent_dim = initial_latent_dim
    best_seen = False
    current = initial_latent_dim
    history: list[tuple[int, float]] = []
    try:
        while True:
            mae = validation_mae(
                cached,
                current,
                window_size,
                n_features,
                cond_cols=cond_cols,
                **candidate_kwargs,
            )
            history.append((current, mae))
            if not math.isnan(mae) and mae < best_val_mae:
                best_val_mae, best_latent_dim, best_seen = mae, current, True
            elif math.isnan(mae) and not best_seen:
                # reference :348-351 — keep the first model when no val MAE
                best_latent_dim, best_seen = current, True
            if not incremental_search:
                break  # reference :354-359 — single iteration
            if not math.isnan(mae) and mae <= threshold_error:
                break  # reference :361-363 — threshold met
            current += step_size_latent
            if current > max_latent_dim or current <= 0:
                break  # reference :372-379
    finally:
        if cache:
            cached.unpersist()
    return {
        "best_latent_dim": best_latent_dim,
        "best_val_mae": best_val_mae if not math.isinf(best_val_mae) else float("nan"),
        "candidates": history,
    }
