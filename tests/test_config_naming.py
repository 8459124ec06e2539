"""Config precedence (reference config_merger.py parity), normalization
JSON source (S9 file half), decoder output naming (data_processor.py:732)."""

import json

import pytest

from feature_extractor_spark.plans.config import (
    DEFAULT_VALUES,
    convert_type,
    load_config_file,
    merge_config,
    process_unknown_args,
    typed_flags_from_argv,
)


def test_precedence_plugin_lt_defaults_lt_file_lt_cli():
    merged = merge_config(
        defaults={"a": "default", "b": "default", "c": "default", "d": "default"},
        plugin_params={"a": "plugin", "b": "plugin", "c": "plugin", "d": "plugin", "p": 1},
        file_config={"a": "file", "b": "file"},
        cli_args={"a": "cli", "z": "cli-only"},
        typed_flags={"a", "z"},
    )
    assert merged["a"] == "cli"      # CLI beats everything
    assert merged["b"] == "file"     # file beats defaults
    assert merged["c"] == "default"  # defaults beat plugin params
    assert merged["p"] == 1          # plugin key survives when unshadowed
    assert merged["z"] == "cli-only"


def test_untyped_cli_defaults_do_not_shadow_file():
    """argparse defaults (not typed by the user) must NOT override the file
    layer — the reference checks sys.argv (config_merger.py:63-71)."""
    merged = merge_config(
        defaults={"window_size": 144},
        file_config={"window_size": 288},
        cli_args={"window_size": 144},  # argparse default, not typed
        typed_flags=set(),
    )
    assert merged["window_size"] == 288


def test_unknown_args_coerced():
    assert process_unknown_args(["--lr", "0.01", "--epochs", "5"]) == {
        "lr": "0.01", "epochs": "5",
    }
    assert convert_type("5") == 5
    assert convert_type("0.01") == 0.01
    assert convert_type("adam") == "adam"
    merged = merge_config(
        defaults={}, cli_args={}, typed_flags={"epochs"},
        unknown_args={"epochs": "7"},
    )
    assert merged["epochs"] == 7


def test_dashed_unknown_flags_merge():
    """ADVICE r2: '--batch-size 32' must survive the merge — both the typed
    set and the unknown-args dict normalize '-' to '_', so the key forms
    agree (the reference merger passes such flags through)."""
    argv = ["--batch-size", "32"]
    typed = typed_flags_from_argv(argv)
    unknown = process_unknown_args(argv)
    assert unknown == {"batch_size": "32"}
    merged = merge_config(
        defaults={}, cli_args={}, typed_flags=typed, unknown_args=unknown
    )
    assert merged["batch_size"] == 32


def test_typed_flags_from_argv():
    assert typed_flags_from_argv(
        ["--window_size", "8", "--entity-col=doc", "pos", "-x"]
    ) == {"window_size", "entity_col"}


def test_load_config_file(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"latent_dim": 16}))
    assert load_config_file(str(p)) == {"latent_dim": 16}
    assert load_config_file(None) == {}
    assert "window_size" in DEFAULT_VALUES


def test_norm_params_json_roundtrip(tmp_path, spark):
    from feature_extractor_spark.functions.normalize import (
        load_norm_params_json,
        normalize_minmax,
    )

    p = tmp_path / "norm.json"
    p.write_text(json.dumps({
        "OPEN": {"min": 1.0, "max": 3.0},
        "metric_noise": 0.42,  # reference debug JSONs mix metrics in
        "CLOSE": {"min": 0.0, "max": 10.0},
    }))
    params = load_norm_params_json(str(p))
    assert params == {"OPEN": (1.0, 3.0), "CLOSE": (0.0, 10.0)}
    df = spark.createDataFrame([(2.0, 5.0)], "OPEN double, CLOSE double")
    row = normalize_minmax(df, params).first()
    assert row["OPEN"] == 0.5 and row["CLOSE"] == 0.5


def test_decoder_column_naming(spark):
    from feature_extractor_spark.encoder.stage import name_reconstruction_columns

    df = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3])], "id long, reconstruction array<double>"
    )
    named = name_reconstruction_columns(df, ["OPEN", "LOW", "HIGH"])
    assert named.columns == ["id", "OPEN", "LOW", "HIGH"]
    assert abs(named.first()["LOW"] - 0.2) < 1e-12
    # arity mismatch -> generic names (reference data_processor.py:735-738)
    generic = name_reconstruction_columns(df, ["ONLY_TWO", "NAMES"])
    assert generic.columns == [
        "id", "reconstructed_feature_0", "reconstructed_feature_1",
        "reconstructed_feature_2",
    ]
    no_names = name_reconstruction_columns(df, None)
    assert "reconstructed_feature_0" in no_names.columns
    # static width paths: no driver-side first() probe (VERDICT r2 #3) —
    # width from the explicit param or from the decoder weights meta
    import numpy as np

    static = name_reconstruction_columns(df, ["OPEN", "LOW", "HIGH"], n_features=3)
    assert static.columns == ["id", "OPEN", "LOW", "HIGH"]
    via_meta = name_reconstruction_columns(
        df, ["OPEN", "LOW", "HIGH"], weights={"meta": np.array([8, 3])}
    )
    assert via_meta.columns == ["id", "OPEN", "LOW", "HIGH"]


def test_preprocessor_extension_point(spark, sf_small):
    """U4: registry resolution + an applyInPandas preprocessor runs and
    detrends (rolling-mean removal -> near-zero mean residual)."""
    import pytest as _pytest

    from feature_extractor_spark.plans.preprocessor import (
        PREPROCESSORS,
        register_preprocessor,
        run_preprocessing,
    )

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    out = run_preprocessing(
        "detrend_rolling_mean", ev,
        {"entity_col": "user_id", "ts_col": "ts", "value_col": "value"},
    )
    pdf = out.toPandas()
    assert "value_detrended" in pdf.columns
    assert abs(pdf["value_detrended"].mean()) < abs(pdf["value"].mean())

    # round 6: stl_preprocessor is now a REGISTERED engine preprocessor
    # (clean-room loess-STL/Haar/multitaper — tests/test_decompose.py);
    # unknown names still raise with the registry listed
    assert "stl_preprocessor" in PREPROCESSORS
    with _pytest.raises(KeyError, match="unknown preprocessor"):
        run_preprocessing("no_such_preprocessor", ev)

    @register_preprocessor("t_double")
    def _d(df, config):
        from pyspark.sql import functions as F
        return df.withColumn("v2", F.col("value") * 2)

    assert "t_double" in PREPROCESSORS
    assert run_preprocessing("t_double", ev).first()["v2"] == ev.first()["value"] * 2


def test_default_cvae_target_list_matches_reference():
    """P1 parity: the 23-name default ships in DEFAULT_VALUES exactly as
    the reference's config.py:36-43 list (order included — index-based
    selection in the reference depends on it)."""
    from feature_extractor_spark.plans.config import (
        CVAE_TARGET_FEATURE_NAMES,
        DEFAULT_VALUES,
    )

    assert DEFAULT_VALUES["cvae_target_feature_names"] == CVAE_TARGET_FEATURE_NAMES
    assert len(CVAE_TARGET_FEATURE_NAMES) == 23
    assert CVAE_TARGET_FEATURE_NAMES[:6] == [
        "OPEN", "LOW", "HIGH", "vix_close", "BC-BO", "BH-BL"
    ]
    assert CVAE_TARGET_FEATURE_NAMES[6] == "S&P500_Close"
    assert CVAE_TARGET_FEATURE_NAMES[7:15] == [
        f"CLOSE_15m_tick_{i}" for i in range(1, 9)
    ]
    assert CVAE_TARGET_FEATURE_NAMES[15:] == [
        f"CLOSE_30m_tick_{i}" for i in range(1, 9)
    ]
    # defaults are copied, not aliased: mutating a merged config must not
    # poison the module-level default
    assert DEFAULT_VALUES["cvae_target_feature_names"] is not CVAE_TARGET_FEATURE_NAMES


def test_select_targets_contract(spark):
    """select_targets: by-name projection with the reference's hard-error
    contract (first missing feature named + available list echoed,
    data_processor.py:86-97)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from feature_extractor_spark.plans.config import CVAE_TARGET_FEATURE_NAMES
    from feature_extractor_spark.plans.targets import select_targets

    base = spark.range(5).select(
        F.col("id"),
        *[
            (F.col("id") * (i + 1)).cast("double").alias(name)
            for i, name in enumerate(CVAE_TARGET_FEATURE_NAMES)
        ],
    )
    out = select_targets(base, keep_cols=["id"])
    assert out.columns == ["id"] + CVAE_TARGET_FEATURE_NAMES
    row = out.orderBy("id").collect()[2]
    assert row["BC-BO"] == 2.0 * 5 and row["S&P500_Close"] == 2.0 * 7

    with _pytest.raises(ValueError, match=r"'CLOSE_30m_tick_8'.*not found"):
        select_targets(base.drop("CLOSE_30m_tick_8"), keep_cols=["id"])

    with _pytest.raises(ValueError, match=r"'nope'"):
        select_targets(base, ["OPEN", "nope"])


def test_driver_query_budget_exactly_50():
    """The driver records at most 50 correctness rows (observed r3: 52
    registered -> 50 recorded, silently dropping the LAST two). Pin the
    registry at exactly 50 with an oracle for every entry so adding a 51st
    query fails HERE instead of silently evicting a flagship row."""
    from feature_extractor_spark.plans.entry_queries import (
        ENTRY_QUERIES,
        ORACLE_SQL,
    )

    assert len(ENTRY_QUERIES) == 50, (
        f"{len(ENTRY_QUERIES)} registered queries — the driver caps at 50; "
        "fold or retire a row before adding"
    )
    missing = [k for k in ENTRY_QUERIES if k not in ORACLE_SQL]
    assert missing == [], f"queries without oracles: {missing}"
    # the two rows r3 lost to the cap must stay registered
    assert "u2_decoder_roundtrip" in ENTRY_QUERIES
    assert "fused_windowed_encode" in ENTRY_QUERIES


def test_fit_normalize_denormalize_roundtrip(spark):
    """fit_minmax -> normalize_minmax -> denormalize_minmax round-trips
    the data (A6/J4's fit/apply/invert API surface; the driver rows
    inline the arithmetic, so the packaged helpers get their own pin).
    Zero-range columns normalize to the 0.0 sentinel."""
    from feature_extractor_spark.functions.normalize import (
        denormalize_minmax,
        fit_minmax,
        normalize_minmax,
    )

    df = spark.createDataFrame(
        [(1, 10.0, 5.0), (2, 20.0, 5.0), (3, 40.0, 5.0)],
        "id long, a double, b double",
    )
    params = fit_minmax(df, ["a", "b"])
    assert params == {"a": (10.0, 40.0), "b": (5.0, 5.0)}
    normed = {r["id"]: r for r in normalize_minmax(df, params).collect()}
    assert normed[1]["a"] == 0.0 and normed[3]["a"] == 1.0
    assert abs(normed[2]["a"] - 1.0 / 3.0) < 1e-12
    assert all(r["b"] == 0.0 for r in normed.values())  # zero range
    # denormalize inverts (for the non-degenerate column)
    back = {
        r["id"]: r["a"]
        for r in denormalize_minmax(
            normalize_minmax(df.select("id", "a"), {"a": params["a"]}),
            {"a": params["a"]},
        ).collect()
    }
    assert back == {1: 10.0, 2: 20.0, 3: 40.0}
