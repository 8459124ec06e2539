"""Configuration layer (SURVEY.md §2.1 S6-adjacent; reference parity).

Reproduces the reference's config precedence chain
(/root/reference/app/config_merger.py:18-77):

    plugin params (lowest) < engine defaults < config file < CLI (highest)

plus its two quirks, kept deliberately:

- CLI values win only for flags the user actually TYPED (argparse defaults
  do not shadow the file config) — the reference checks sys.argv for the
  flag before merging (config_merger.py:63-71); here the caller passes the
  typed-flag set explicitly so the function stays testable.
- unknown ``--key value`` pairs are accepted and type-coerced int -> float
  -> string (config_merger.py:6-14).

Remote JSON config over HTTP (S6, reference app/config_handler.py) lives in
plans/remote_config.py (stdlib urllib, driver-side); pipeline.main wires it
as the file layer when --remote_load_config is passed, matching
main.py:48-50.
"""

from __future__ import annotations

import json

# The reference's default CVAE target feature list, shipped verbatim as a
# config default (/root/reference/app/config.py:36-43): 6 base OHLC/vol
# columns + S&P500 close + 8 15-minute ticks + 8 30-minute ticks = 23.
# A reference user's default config must resolve to the same selection.
CVAE_TARGET_FEATURE_NAMES: list[str] = [
    "OPEN", "LOW", "HIGH", "vix_close", "BC-BO", "BH-BL",
    "S&P500_Close",
    "CLOSE_15m_tick_1", "CLOSE_15m_tick_2", "CLOSE_15m_tick_3",
    "CLOSE_15m_tick_4", "CLOSE_15m_tick_5", "CLOSE_15m_tick_6",
    "CLOSE_15m_tick_7", "CLOSE_15m_tick_8",
    "CLOSE_30m_tick_1", "CLOSE_30m_tick_2", "CLOSE_30m_tick_3",
    "CLOSE_30m_tick_4", "CLOSE_30m_tick_5", "CLOSE_30m_tick_6",
    "CLOSE_30m_tick_7", "CLOSE_30m_tick_8",
]

# Engine defaults (the reference's DEFAULT_VALUES analog, trimmed to keys
# the Spark engine consumes; /root/reference/app/config.py:1-60)
DEFAULT_VALUES: dict = {
    "window_size": 144,
    "latent_dim": 32,
    "rnn_hidden_dim": 4,
    "conditioning_dim": 10,
    "encoder_plugin": "vae_small",
    "decoder_plugin": "vae_small",
    "entity_col": "doc_id",
    "ts_col": "ts",
    "max_rows": None,
    "headers": True,
    "force_date": False,
    "use_normalization_json": None,
    "cvae_target_feature_names": list(CVAE_TARGET_FEATURE_NAMES),
}


def convert_type(value: str):
    """int -> float -> string coercion for unknown CLI args
    (reference config_merger.py:8-14)."""
    try:
        return int(value)
    except (TypeError, ValueError):
        try:
            return float(value)
        except (TypeError, ValueError):
            return value


def process_unknown_args(unknown_args: list[str]) -> dict:
    """['--k1', 'v1', '--k2', 'v2'] -> {'k1': 'v1', 'k2': 'v2'}
    (reference config_merger.py:6). '-' normalizes to '_' the same way
    typed_flags_from_argv does — otherwise '--batch-size 32' matches
    neither side of the merge and is silently dropped."""
    return {
        unknown_args[i].lstrip("-").replace("-", "_"): unknown_args[i + 1]
        for i in range(0, len(unknown_args) - 1, 2)
    }


def load_config_file(path: str | None) -> dict:
    """Local JSON config file layer."""
    if not path:
        return {}
    with open(path) as f:
        return json.load(f)


def merge_config(
    defaults: dict | None = None,
    plugin_params: dict | None = None,
    file_config: dict | None = None,
    cli_args: dict | None = None,
    typed_flags: set[str] | None = None,
    unknown_args: dict | None = None,
) -> dict:
    """Merge the config layers with the reference's precedence.

    ``cli_args`` is the full argparse namespace as a dict; only keys in
    ``typed_flags`` (flags literally present on the command line) override —
    argparse defaults never beat the file config, matching the reference's
    sys.argv check. ``unknown_args`` values get int/float coercion.
    """
    merged: dict = {}
    merged.update(plugin_params or {})
    merged.update(defaults if defaults is not None else DEFAULT_VALUES)
    merged.update(file_config or {})
    cli_args = cli_args or {}
    typed = typed_flags if typed_flags is not None else set(cli_args)
    for key in typed:
        if key in cli_args:
            merged[key] = cli_args[key]
        elif unknown_args and key in unknown_args:
            merged[key] = convert_type(unknown_args[key])
    return merged


def typed_flags_from_argv(argv: list[str]) -> set[str]:
    """The set of flag names the user actually typed (reference
    config_merger.py:63: cli_keys from sys.argv), with '-' normalized to
    '_' the way argparse does."""
    return {
        a.lstrip("-").split("=", 1)[0].replace("-", "_")
        for a in argv
        if a.startswith("--")
    }
