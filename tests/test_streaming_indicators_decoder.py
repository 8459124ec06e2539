"""Streaming sessionization vs batch parity, W7 indicators vs pandas,
decoder stage round-trip."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.encoder import (
    decode_stage,
    decoder_forward,
    init_decoder_weights,
)
from feature_extractor_spark.functions.indicators import (
    ema_macd,
    ohlc_indicators,
    rsi,
    stochastic,
)
from feature_extractor_spark.operators.sessionize import session_bounds
from feature_extractor_spark.streaming import stream_sessionize


def _events(spark, n_users=3, n=40):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(n_users):
        t = base
        for i in range(n):
            gap = dt.timedelta(minutes=5 if i % 10 else 120)  # session break each 10
            t = t + gap
            rows.append((f"u{u}", t, float(i)))
    return spark.createDataFrame(rows, "doc_id string, ts timestamp, value double")


def test_stream_sessionize_matches_batch(spark, tmp_path):
    df = _events(spark)
    src = str(tmp_path / "src")
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    sessions = stream_sessionize(stream, "doc_id", "ts", gap_seconds=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("sess_out")
        .orderBy("doc_id", "session_start")
        .toPandas()
    )
    exp = (
        session_bounds(df, "doc_id", "ts", gap_seconds=1800)
        .orderBy("doc_id", "session_start")
        .toPandas()
    )
    assert len(got) == len(exp)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["session_start"].tolist() == exp["session_start"].tolist()


def _ohlc(spark, n=120):
    base = dt.datetime(2024, 1, 1)
    rows = []
    px = 100.0
    for i in range(n):
        px = px + ((i * 37) % 11 - 5) * 0.4
        rows.append(
            ("e1", base + dt.timedelta(hours=i), px - 0.3, px + 0.5, px - 0.6, px)
        )
    return spark.createDataFrame(
        rows, "doc_id string, ts timestamp, OPEN double, HIGH double, LOW double, CLOSE double"
    )


def test_ema_macd_matches_pandas(spark):
    df = _ohlc(spark)
    got = (
        ema_macd(df, "doc_id", "ts", "CLOSE")
        .orderBy("ts")
        .toPandas()
    )
    c = df.orderBy("ts").toPandas()["CLOSE"]
    exp20 = c.ewm(span=20, adjust=False).mean()
    assert np.allclose(got["ema_20"], exp20, rtol=1e-12)
    macd = c.ewm(span=12, adjust=False).mean() - c.ewm(span=26, adjust=False).mean()
    assert np.allclose(got["macd"], macd, rtol=1e-12)
    sig = macd.ewm(span=9, adjust=False).mean()
    assert np.allclose(got["macd_signal"], sig, rtol=1e-12)


def test_rsi_stochastic_vs_pandas(spark):
    df = _ohlc(spark)
    got = rsi(df, "doc_id", "ts", "CLOSE", 14).orderBy("ts").toPandas()
    c = df.orderBy("ts").toPandas()["CLOSE"]
    delta = c.diff()
    up = delta.clip(lower=0).fillna(0)
    dn = (-delta).clip(lower=0).fillna(0)
    avg_up = up.rolling(14, min_periods=1).mean()
    avg_dn = dn.rolling(14, min_periods=1).mean()
    exp = 100 - 100 / (1 + avg_up / avg_dn)
    exp = exp.where(avg_dn != 0, 100.0)
    assert np.allclose(got["rsi_14"], exp, rtol=1e-9)

    got_s = stochastic(df, "doc_id", "ts", "HIGH", "LOW", "CLOSE").orderBy("ts").toPandas()
    pdf = df.orderBy("ts").toPandas()
    hh = pdf["HIGH"].rolling(14, min_periods=1).max()
    ll = pdf["LOW"].rolling(14, min_periods=1).min()
    exp_k = 100 * (pdf["CLOSE"] - ll) / (hh - ll)
    assert np.allclose(got_s["stoch_k_14"], exp_k, rtol=1e-9)


def test_ohlc_indicator_bundle_columns(spark):
    out = ohlc_indicators(_ohlc(spark), "doc_id", "ts")
    for col in ["rsi_14", "stoch_k_14", "stoch_d_14_3", "atr_14", "sma_20",
                "ema_20", "ema_50", "macd", "macd_signal", "macd_hist"]:
        assert col in out.columns
    assert out.count() == 120


def test_decode_stage_matches_oracle(spark):
    rng = np.random.default_rng(5)
    z = rng.standard_normal((30, 6)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in z[i]]) for i in range(30)],
        "row_id long, z_mean array<float>",
    )
    weights = init_decoder_weights(latent_dim=6, n_features=4)
    got = decode_stage(df, weights, keep_cols=["row_id"]).orderBy("row_id").toPandas()
    exp = decoder_forward(z, weights)
    got_x = np.asarray([np.asarray(v) for v in got["reconstruction"]])
    assert got_x.shape == (30, 4)
    assert np.allclose(got_x, exp, rtol=1e-5, atol=1e-7)


def test_stream_ema_matches_batch_across_microbatches(spark, tmp_path):
    """applyInPandasWithState EMA: state carries across micro-batches, so a
    source split into multiple files/batches must equal the single-pass
    pandas ewm on the full series."""
    from feature_extractor_spark.streaming import stream_ema

    import os
    import time as _time

    df = _events(spark, n_users=2, n=30)
    src = str(tmp_path / "ema_src")
    # time-ordered files + maxFilesPerTrigger=1 => in-order micro-batches
    # (streaming EMA, like any order-recursive op, assumes in-order arrival
    # per entity; the file source picks files by modification time)
    os.makedirs(src)
    pdf_all = df.toPandas().sort_values(["ts"], kind="mergesort")
    halves = [pdf_all.iloc[: len(pdf_all) // 2], pdf_all.iloc[len(pdf_all) // 2 :]]
    for i, half in enumerate(halves):
        spark.createDataFrame(half).coalesce(1).write.parquet(f"{src}/part{i}")
        _time.sleep(1.1)  # distinct mtimes -> deterministic source order
    import glob as _glob
    files = sorted(_glob.glob(f"{src}/part*/part-*.parquet"))
    flat = [f"{src}/f{i}.parquet" for i in range(len(files))]
    for a, b in zip(files, flat):
        os.rename(a, b)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*.parquet")
    )
    # timeout_minutes=None: availableNow never terminates under
    # ProcessingTimeTimeout (endless timeout-evaluation batches)
    out = stream_ema(stream, "doc_id", "ts", "value", span=5, timeout_minutes=None)
    q = (
        out.writeStream.format("memory")
        .queryName("ema_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("ema_out").orderBy("doc_id", "ts").toPandas()
    exp = (
        df.toPandas()
        .sort_values(["doc_id", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp["ema_5"] = exp.groupby("doc_id")["value"].transform(
        lambda s: s.ewm(span=5, adjust=False).mean()
    )
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["ema_5"], exp["ema_5"], rtol=1e-9)


def test_ema_macd_cross_batch_carry(spark):
    """The mapInPandas EMA path must be exact when one entity spans many
    Arrow batches (tiny maxRecordsPerBatch forces boundaries)."""
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "37")
    try:
        df = _events(spark, n_users=3, n=100)
        got = (
            ema_macd(df, "doc_id", "ts", "value")
            .orderBy("doc_id", "ts")
            .toPandas()
        )
        exp = (
            df.toPandas()
            .sort_values(["doc_id", "ts"], kind="mergesort")
            .reset_index(drop=True)
        )
        g = exp.groupby("doc_id")["value"]
        for s in (20, 50, 12, 26):
            exp[f"__e{s}"] = g.transform(
                lambda x, sp=s: x.ewm(span=sp, adjust=False).mean()
            )
        exp["macd"] = exp["__e12"] - exp["__e26"]
        exp["macd_signal"] = exp.groupby("doc_id")["macd"].transform(
            lambda x: x.ewm(span=9, adjust=False).mean()
        )
        np.testing.assert_allclose(got["ema_20"], exp["__e20"], rtol=1e-12)
        np.testing.assert_allclose(got["ema_50"], exp["__e50"], rtol=1e-12)
        np.testing.assert_allclose(got["macd"], exp["macd"], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            got["macd_signal"], exp["macd_signal"], rtol=1e-9, atol=1e-12
        )
    finally:
        spark.conf.set(conf, old)


def test_stream_windowed_encode_matches_batch(spark, tmp_path):
    """Stateful streaming windowed-encode: trailing (W-1)-row state carried
    across micro-batches must reproduce the batch sliding-window + encoder
    latents exactly (allclose — float32 GEMM)."""
    import glob as _glob
    import os
    import time as _time

    from feature_extractor_spark.encoder import encode_stage, init_weights
    from feature_extractor_spark.operators.windows import sliding_windows
    from feature_extractor_spark.streaming import stream_windowed_encode

    W = 8
    df = _events(spark, n_users=2, n=30)
    weights = init_weights(
        window_size=W, n_features=1, rnn_hidden_dim=0,
        conditioning_dim=0, latent_dim=6,
    )

    src = str(tmp_path / "we_src")
    os.makedirs(src)
    pdf_all = df.toPandas().sort_values(["ts"], kind="mergesort")
    thirds = [
        pdf_all.iloc[: len(pdf_all) // 3],
        pdf_all.iloc[len(pdf_all) // 3 : 2 * len(pdf_all) // 3],
        pdf_all.iloc[2 * len(pdf_all) // 3 :],
    ]
    for i, part in enumerate(thirds):
        spark.createDataFrame(part).coalesce(1).write.parquet(f"{src}/part{i}")
        _time.sleep(1.1)
    files = sorted(_glob.glob(f"{src}/part*/part-*.parquet"))
    for i, a in enumerate(files):
        os.rename(a, f"{src}/f{i}.parquet")

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*.parquet")
    )
    out = stream_windowed_encode(
        stream, "doc_id", "ts", ["value"], W, weights, timeout_minutes=None
    )
    # state-store tasks = shuffle partitions; 32 x 3 micro-batches is pure
    # overhead for a 2-entity stream — drop to 4 for this query
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("we_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    got = spark.table("we_out").orderBy("doc_id", "ts").toPandas()

    win = sliding_windows(df, "doc_id", "ts", ["value"], W)
    batch = (
        encode_stage(win, weights, keep_cols=["doc_id", "ts"])
        .orderBy("doc_id", "ts")
        .toPandas()
    )
    assert len(got) == len(batch) > 0
    assert got["doc_id"].tolist() == batch["doc_id"].tolist()
    assert got["ts"].tolist() == batch["ts"].tolist()
    z_stream = np.asarray([np.asarray(v) for v in got["z_mean"]])
    z_batch = np.asarray([np.asarray(v) for v in batch["z_mean"]])
    np.testing.assert_allclose(z_stream, z_batch, rtol=1e-5, atol=1e-6)


def test_stream_checkpoint_restart_exactly_once(spark, tmp_path):
    """Kill/restart resumability for the stateful streaming path: a second
    run with the SAME checkpointLocation must resume from committed offsets
    and state — no reprocessing, no duplicates, EMA carry intact across the
    restart boundary (the streaming analog of the lineage-manifest resume)."""
    import glob as _glob
    import os

    from feature_extractor_spark.streaming import stream_ema

    df = _events(spark, n_users=2, n=20)
    src = str(tmp_path / "ck_src")
    ckpt = str(tmp_path / "ck_state")
    sink = str(tmp_path / "ck_sink")
    os.makedirs(src)
    pdf_all = df.toPandas().sort_values("ts", kind="mergesort")

    def run_once():
        stream = spark.readStream.schema(df.schema).parquet(src + "/f*.parquet")
        out = stream_ema(stream, "doc_id", "ts", "value", span=5, timeout_minutes=None)
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # first half -> run -> "crash" (query terminated) -> second half -> rerun
    spark.createDataFrame(pdf_all.iloc[:20]).coalesce(1).write.parquet(f"{src}/p0")
    os.rename(
        _glob.glob(f"{src}/p0/part-*.parquet")[0], f"{src}/f0.parquet"
    )
    run_once()
    n_first = spark.read.parquet(sink).count()
    assert n_first == 20
    spark.createDataFrame(pdf_all.iloc[20:]).coalesce(1).write.parquet(f"{src}/p1")
    os.rename(
        _glob.glob(f"{src}/p1/part-*.parquet")[0], f"{src}/f1.parquet"
    )
    run_once()

    got = spark.read.parquet(sink).orderBy("doc_id", "ts").toPandas()
    assert len(got) == len(pdf_all)  # no duplicates, nothing dropped
    exp = (
        df.toPandas()
        .sort_values(["doc_id", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp["ema_5"] = exp.groupby("doc_id")["value"].transform(
        lambda s: s.ewm(span=5, adjust=False).mean()
    )
    # state survived the restart: rows AFTER the boundary continue the
    # recursion from the first run's carry, matching the single-pass oracle
    np.testing.assert_allclose(got["ema_5"].to_numpy(), exp["ema_5"].to_numpy(), rtol=1e-9)


def test_stateless_curation_ops_run_on_streams(spark, tmp_path):
    """The map-side curation signals (quality, repetition, C4 cleaning,
    LM scoring, compression ratio, PII redaction) are stateless
    projections, so the SAME functions must run unmodified on a
    streaming DataFrame and emit values identical to the batch run —
    the contract that lets a curation front-end sit on a live ingest."""
    from pyspark.sql import functions as F

    from feature_extractor_spark.functions.lm import lm_score, train_char_lm
    from feature_extractor_spark.functions.text import (
        c4_clean,
        compression_ratio,
        quality_score,
        redact_pii,
        repetition_signals,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    model = train_char_lm(docs, sample_size=50)

    def transform(df):
        out = repetition_signals(quality_score(df, "text"), "text")
        out = c4_clean(out, "text")
        out = compression_ratio(out, "text")
        out = redact_pii(out, "text")
        return lm_score(out, model, "text")

    batch = transform(spark.read.parquet(src))

    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    q = (
        transform(spark.readStream.schema(docs.schema).parquet(src))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    cols = ["doc_id", "quality", "dup_line_frac", "text_clean",
            "compression_ratio", "lm_bits_per_char"]
    b = {r["doc_id"]: r for r in batch.select(cols).collect()}
    s = {r["doc_id"]: r for r in spark.read.parquet(sink).select(cols).collect()}
    assert set(b) == set(s) and len(b) == 100
    for k in b:
        for c in cols[1:]:
            bv, sv = b[k][c], s[k][c]
            if isinstance(bv, float):
                assert abs(bv - sv) < 1e-12, (k, c)
            else:
                assert bv == sv, (k, c)


def test_stream_windowed_stats_matches_batch_window(spark, tmp_path):
    """stream_windowed_stats (watermarked tumbling window) over a file
    stream matches the same window aggregate computed in batch. Append
    mode emits a window only after a LATER micro-batch advances the
    watermark past its end, so the test runs two availableNow passes
    with a late file added in between."""
    from pyspark.sql import functions as F

    from feature_extractor_spark.streaming import stream_windowed_stats

    src = str(tmp_path / "wsrc")
    out_dir = str(tmp_path / "wout")
    ck = str(tmp_path / "wck")
    rows = [
        ("a", f"2024-01-01 00:{m:02d}:00", float(m)) for m in range(0, 50, 7)
    ] + [("b", "2024-01-01 01:05:00", 100.0)]
    df = spark.createDataFrame(rows, "doc_id string, ts string, value double")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(df.schema).parquet(src)
        q = (
            stream_windowed_stats(
                stream, "doc_id", "ts", "value",
                window="30 minutes", watermark="1 minute",
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    # a later event advances the watermark past entity a's windows
    late = spark.createDataFrame(
        [("c", "2024-01-01 03:00:00", 1.0)],
        "doc_id string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    late.coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = {
        (r["doc_id"], str(r["win_start"])): (r["n_events"], r["win_sum"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r["doc_id"], str(r["window"]["start"])): (r["n"], r["s"])
        for r in df.groupBy(F.window("ts", "30 minutes"), "doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    for k, v in got.items():
        assert batch[k] == v
    # both of entity a's fully-closed windows must have been emitted
    assert ("a", "2024-01-01 00:00:00") in got
    assert ("a", "2024-01-01 00:30:00") in got
