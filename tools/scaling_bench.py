"""Scaling-efficiency evidence (BASELINE.json north rule).

Runs the headline stage — as-of join (LOCF) + sliding-window feature build
+ Arrow encoder forward — over the deterministic synthetic tokens table at
a given parallelism, printing one JSON line. The orchestrator (tools/
run_scaling.py) runs this at local[8] and local[32] in fresh JVMs on the
SAME input and computes efficiency = (T_N / T_4N) / 4.

Input is generated (spark.range-based, deterministic) then written to
parquet ONCE and read back, so both runs scan identical bytes with
identical partitioning opportunities.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_ROWS = int(os.environ.get("SCALE_ROWS", "3000000"))
DATA_DIR = os.environ.get("SCALE_DATA", "/tmp/fx_scale_tokens")
W = int(os.environ.get("SCALE_W", "48"))  # reference uses W=144


def ensure_data(spark) -> None:
    from feature_extractor_spark.sources.tokens import synth_tokens

    marker = os.path.join(DATA_DIR, "_SUCCESS")
    if os.path.exists(marker):
        return
    df = synth_tokens(spark, n_rows=N_ROWS, n_docs=max(200, N_ROWS // 2000))
    df.write.mode("overwrite").parquet(DATA_DIR)


STAGE = os.environ.get("SCALE_STAGE", "full")  # full | asof_window | dedup | packing | bpe
N_DOCS = int(os.environ.get("SCALE_DOCS", "200000"))
DOCS_DIR = os.environ.get("SCALE_DOCS_DATA", "/tmp/fx_scale_docs")


def ensure_docs(spark) -> None:
    """Deterministic synthetic corpus with planted near-dup structure:
    every doc is 40 vocab words keyed by xxhash64(doc_id, position); docs
    in the same 50-id template group share a base id for all but 3
    positions, so each group collapses to near-dup clusters while
    cross-group jaccard stays low. Pure expressions — no driver data."""
    marker = os.path.join(DOCS_DIR, "_SUCCESS")
    if os.path.exists(marker):
        return
    vocab = F.array(
        *[F.lit(f"w{i:04d}") for i in range(2000)]
    )
    base = F.when(
        F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(5)) < 2,
        F.col("id") - F.pmod(F.col("id"), F.lit(50)),
    ).otherwise(F.col("id"))
    word_key = (
        lambda i: F.when(
            F.pmod(F.xxhash64(F.col("id"), i, F.lit(13)), F.lit(40)) < 3,
            F.xxhash64(F.col("id"), i),  # per-doc noise positions
        ).otherwise(F.xxhash64(F.col("__base"), i))
    )
    df = (
        spark.range(N_DOCS)
        .withColumn("__base", base)
        .select(
            F.concat(F.lit("doc"), F.col("id").cast("string")).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(39)),
                    lambda i: F.element_at(
                        vocab, (F.pmod(word_key(i), F.lit(2000)) + 1).cast("int")
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )
    # fixed 64-way layout regardless of which config generates the data:
    # spark.range inherits the GENERATING session's parallelism, so a
    # 4-core generator would write ~4 big files and cap every later
    # config's pre-shuffle (scan + explode) stage at the file split
    # count — the r9 bpe stage measured 0.30 "efficiency" that was
    # really a 4-file input starving 16 cores. 64 files give both
    # configs identical, sufficient split opportunities (the harness's
    # stated contract).
    df.repartition(64).write.mode("overwrite").parquet(DOCS_DIR)


def _dedup_stage(spark):
    """The LLM-curation dedup core as the measured stage: banded MinHash
    candidates -> exact-jaccard verify -> star-contraction transitive
    closure -> canonical survivors. Wall includes the bounded CC driver
    loop (it is part of the real cost)."""
    from feature_extractor_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dup_clusters,
    )

    docs = spark.read.parquet(DOCS_DIR)
    # eager=True: pairs materialize inside the timed section AND the
    # shingle cache is released per run (eager=False would leak one
    # word-hash cache per repetition)
    pairs = minhash_lsh_pairs(docs, threshold=0.6, eager=True)
    return near_dup_clusters(pairs, docs, "doc_id")


def _asof_window_features(spark, heavy):
    """The north rule's scaling target, verbatim: range-partitioned as-of
    merge (LOCF backfill) + windowed feature builder — lag/lead features
    via Window.partitionBy(doc_id).orderBy(ts).rowsBetween plus frame
    aggregates. Pure JVM (whole-stage codegen), no Python stage."""
    from pyspark.sql import Window

    from feature_extractor_spark.operators.asof import asof_join
    from feature_extractor_spark.operators.windows import lag_lead_features

    toks = spark.read.parquet(DATA_DIR)
    left = toks.select(
        "doc_id",
        "ts",
        (F.col("n_tok").cast("double") / 64.0).alias("f_len"),
        (
            F.aggregate(
                F.col("tokens"), F.lit(0.0), lambda acc, t: acc + t.cast("double")
            )
            / F.col("n_tok")
            / 50257.0
        ).alias("f_mean_tok"),
    )
    right = left.filter(F.pmod(F.xxhash64("doc_id", "ts"), F.lit(20)) == 0).select(
        "doc_id", "ts", F.col("f_mean_tok").alias("aux")
    )
    joined = asof_join(
        left, right, on="ts", by="doc_id", strategy="auto", heavy_keys=heavy
    ).na.fill({"aux": 0.0})
    feat = lag_lead_features(joined, "doc_id", "ts", "f_mean_tok",
                             lags=[1, 3, 8], leads=[1])
    w = Window.partitionBy("doc_id").orderBy("ts").rowsBetween(-(W - 1), 0)
    return feat.select(
        "doc_id",
        "ts",
        *[c for c in feat.columns if c.startswith("f_mean_tok_")],
        F.sum("f_len").over(w).alias("win_sum"),
        F.min("f_mean_tok").over(w).alias("win_min"),
        F.max("f_mean_tok").over(w).alias("win_max"),
        F.avg("aux").over(w).alias("win_aux_avg"),
    )


def _packing_stage(spark):
    """r8: padding-aware bin packing at scale — the metadata-only
    pandas stage (24 B/row through Arrow) + the assignment join-back,
    exactly the shape the 100 TB argument rests on. seq_id is unique by
    construction ((doc_id, ts) is unique in the generator)."""
    from feature_extractor_spark.operators.packing import pack_bins

    toks = spark.read.parquet(DATA_DIR).withColumn(
        "seq_id", F.xxhash64("doc_id", "ts")
    )
    return pack_bins(
        toks, "seq_id", n_tok_col="n_tok", capacity=2048, n_shards=1024
    )


def _bpe_stage(spark):
    """r9: BPE merge learning at scale. The corpus-bearing cost is the
    ONE explode + map-side-partial word-frequency shuffle (the only
    stage that touches corpus bytes); the driver merge loop over the
    distinct-word table is parallelism-INDEPENDENT by design — its cost
    depends on the distinct-word count and alphabet, not the corpus
    size, so at real corpus scale its share vanishes while on this
    synthetic corpus (2000 distinct words over an 11-char alphabet) it
    is a large fixed term. SCALE_BPE_MERGES picks the variant:
    the default 200 measures the whole operator (driver loop included,
    honest Amdahl share at THIS corpus size); 0 isolates the
    distributed word-count portion — the part whose scaling the 100 TB
    argument rests on."""
    from feature_extractor_spark.functions.text import learn_bpe

    docs = spark.read.parquet(DOCS_DIR)
    merges_df, _vocab = learn_bpe(
        docs,
        num_merges=int(os.environ.get("SCALE_BPE_MERGES", "200")),
        min_count=2,
    )
    return merges_df


def pipeline(spark, heavy=None):
    if STAGE == "dedup":
        return _dedup_stage(spark)
    if STAGE == "bpe":
        return _bpe_stage(spark)
    if STAGE == "packing":
        return _packing_stage(spark)
    if STAGE == "asof_window":
        return _asof_window_features(spark, heavy)
    from feature_extractor_spark.encoder import init_weights
    from feature_extractor_spark.operators.asof import asof_join
    from feature_extractor_spark.operators.fused import windowed_encode

    toks = spark.read.parquet(DATA_DIR)
    # scalar features from the token arrays (stays JVM-side)
    left = toks.select(
        "doc_id",
        "ts",
        (F.col("n_tok").cast("double") / 64.0).alias("f_len"),
        (
            F.aggregate(
                F.col("tokens"), F.lit(0.0), lambda acc, t: acc + t.cast("double")
            )
            / F.col("n_tok")
            / 50257.0
        ).alias("f_mean_tok"),
    )
    right = left.filter(F.pmod(F.xxhash64("doc_id", "ts"), F.lit(20)) == 0).select(
        "doc_id", "ts", F.col("f_mean_tok").alias("aux")
    )
    if heavy is None:
        from feature_extractor_spark.operators.skew import detect_heavy_hitters

        heavy = detect_heavy_hitters(toks, "doc_id", threshold_share=0.02)
    joined = asof_join(
        left, right, on="ts", by="doc_id", strategy="auto", heavy_keys=heavy
    ).na.fill({"aux": 0.0})
    # fused window+encode: windows exist only as NumPy views inside the
    # Arrow stage — no W-times array amplification through JVM or shuffle
    # d_model=32: closer to the reference encoder's compute density (its
    # vae_small is MHA + conv stack + BiLSTM per window — far heavier than
    # a d=16 sketch)
    weights = init_weights(
        window_size=W, n_features=3, rnn_hidden_dim=4,
        conditioning_dim=10, latent_dim=16, d_model=32,
    )
    # cond_cols=None: cyclical conditioning computed in-stage from ts
    return windowed_encode(
        joined, "doc_id", "ts", ["f_len", "f_mean_tok", "aux"], None, W, weights,
        # chunk ~ the light entities' group size: a heavy chunk bigger than
        # the average task creates a straggler tail (measured 40% idle)
        rows_per_chunk=1024, rn_ts_chunk_seconds=6 * 3600, heavy_keys=heavy,
    )


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from feature_extractor_spark.session import get_spark

    spark = get_spark("scaling-bench", cores=cores)
    if STAGE in ("dedup", "bpe"):
        ensure_docs(spark)
    else:
        ensure_data(spark)

    # heavy-hitter detection is planning, not the measured stage: hoist it
    # (in production it is amortized over the whole job / cached stats)
    from feature_extractor_spark.operators.skew import detect_heavy_hitters

    heavy = (
        None
        if STAGE in ("dedup", "bpe")
        else detect_heavy_hitters(
            spark.read.parquet(DATA_DIR), "doc_id", threshold_share=0.02
        )
    )

    # warm once (JIT), then min-of-N steady-state runs. (Requires
    # ParallelGC — under G1, repeated runs DEGRADED up to 3x from old-gen
    # growth, poisoning warm measurements; see session.py.)
    if os.environ.get("SCALE_WARM", "1") != "0":
        pipeline(spark, heavy).write.format("noop").mode("overwrite").save()
    walls = []
    for _ in range(int(os.environ.get("SCALE_RUNS", "2"))):
        t0 = time.time()
        pipeline(spark, heavy).write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    wall = min(walls)
    # analytic sequence count (windows per doc = max(n_i - W + 1, 0)):
    # counting via the pipeline would re-run the whole encoder stage.
    # asof_window mode emits one feature row per input row.
    if STAGE in ("dedup", "bpe"):
        n_seq = N_DOCS
    elif STAGE in ("asof_window", "packing"):
        n_seq = N_ROWS
    else:
        n_seq = (
            spark.read.parquet(DATA_DIR)
            .groupBy("doc_id")
            .count()
            .select(F.greatest(F.col("count") - (W - 1), F.lit(0)).alias("w"))
            .agg(F.sum("w"))
            .first()[0]
        )
    print(
        json.dumps(
            {
                "cores": cores,
                "rows": N_ROWS,
                "sequences": n_seq,
                "wall_sec": round(wall, 2),
                "sequences_per_sec": round(n_seq / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
