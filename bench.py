"""Benchmark harness: headline = sequences/sec through the as-of-join +
windowed-feature + encoder-forward stage (BASELINE.json metric), plus
per-query wall-clock for the representative operator set.

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "sequences_per_sec": ..., "cores": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Each query is forced through the noop sink (full materialization — count()
alone would let Catalyst prune the projections we're trying to measure).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_revenue_by_nation",
    "w1_window_agg",
    "w3_lag_lead",
    "w6_sessionize",
    "j3_asof_locf",
    "j4_normalize_broadcast",
    "p4_cyclical_features",
    "a7_unwindow",
    "dedup_exact",  # driver row retired r6 (slot ceded to line_dedup); kept
    # here as a raw-operator timing for cross-round comparability
    "line_dedup",
    "span_removal",
    "dedup_minhash_lsh",
    "tokens_chunking",  # replaced text_quality r6 (slot ceded in the registry)
    "ann_cosine_topk",
    "encoder_latents",  # raw builder (fixture-compare form is sf0.01-only)
    "encoder_vae_small_latents",  # raw builder, same reason
    "w7_ema_macd",
    # round-3 additions
    "simhash_near_dup",
    "tokens_asof_window_features",
    "tokens_pack_sequences",
    "doc_stratified_sample",
    "multimodal_features",
    # round-4: the composed curation pipeline (dedup -> filter -> pack)
    "curation_pipeline",
    # round-5: same pipeline with the CCNet-style LM filter enabled —
    # measures the vectorized lm_score stage (train + broadcast + one
    # Arrow scoring pass) inside the composition
    "curation_pipeline_lm",
    # round-6: the composed INPUT-HINT payload path — token-gram dedup ->
    # filters -> fixed-context chunking -> EOS -> shuffle -> packing
    "curation_tokens_pipeline",
    # round-7: padding-aware whole-sequence bin packing (best-fit path)
    "tokens_pack_bins",
    # round-8: subword BPE apply-encoder over the documents table
    "text_encode_bpe",
    # round-9: BPE merge LEARNING — one distributed word-count shuffle +
    # the bounded driver merge loop (functions/text.learn_bpe)
    "text_learn_bpe",
    # round-9: seed-set quality classifier — bounded distributed LR fit
    # + the map-only corpus scoring pass + deterministic Pareto keep
    "text_quality_classifier",
    # round-8: perceptual image near-dup (decode + dHash + banded Hamming)
    "image_near_dup",
    # round-8: top-k ADC search against the PERSISTED ANN index (the
    # warm run builds the index once; timed runs measure query-only —
    # the build-once query-many operating point, vs ann_cosine_topk's
    # exact scan and the inline retrain-every-call ivfpq)
    "ann_persisted_topk",
]


def _curation_query(spark, sf_dir: str):
    """End-to-end corpus curation over the documents table (timed
    including the bounded connected-components driver loop)."""
    from feature_extractor_spark.plans.tokens_pipeline import curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curate(docs, context_len=2048)


def _curation_lm_query(spark, sf_dir: str):
    """Curation with the LM quality cut on (vectorized scorer hot path)."""
    from feature_extractor_spark.plans.tokens_pipeline import curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curate(docs, context_len=2048, lm_max_bits=8.0)


def _curation_tokens_query(spark, sf_dir: str):
    """Composed curation over the INPUT-HINT tokens payload (synth table
    scaled with sf): token-gram dedup -> filters -> fixed-context
    chunking -> EOS -> shuffle -> packing."""
    from feature_extractor_spark.plans.tokens_pipeline import curate_tokens
    from feature_extractor_spark.sources.tokens import synth_tokens

    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    n_rows = max(5_000, int(300_000 * sf))  # 30k rows at sf0.1
    tok = synth_tokens(spark, n_rows=n_rows, n_docs=max(50, n_rows // 100))
    # threshold 0.9: the affine generator's token sets are lattice shifts
    # of one progression, so the similarity graph is systematically dense
    # — at 0.6 the CC closure walks tens of thousands of verified pairs
    # (a closure stress case, but it would drown the rest of the
    # composition); 0.9 keeps every stage exercised at bounded density.
    # Density is now OBSERVABLE before it burns a run: pass
    # stage_counts/max_pairs_per_doc to curate_tokens and read the
    # near_dup_pairs / near_dup_max_degree funnel metrics (r7 _pair_guard)
    # — the guard RAISES instead of silently feeding the closure a clique.
    return curate_tokens(
        tok, context_len=2048, min_tok=8, near_dup_threshold=0.9,
        chunk_max_len=48, chunk_overlap=8, eos_id=50256,
    )


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def headline_pipeline(spark, sf_dir: str):
    """§3.2 dataflow on the scale path: skew-adaptive as-of join -> FUSED
    window build + cyclical conditioning + Arrow encoder forward (windows
    exist only as NumPy views). Returns (n_sequences, seconds)."""
    from pyspark.sql import functions as F

    from feature_extractor_spark.encoder import init_weights
    from feature_extractor_spark.operators.asof import asof_join
    from feature_extractor_spark.operators.fused import windowed_encode
    from feature_extractor_spark.operators.skew import detect_heavy_hitters

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("doc_id"), "ts", "value", "event_type"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "doc_id", "ts", F.col("value").alias("last_purchase_value")
    )
    W = 16
    heavy = detect_heavy_hitters(ev, "doc_id", threshold_share=0.02)
    t0 = time.time()
    joined = asof_join(
        ev.select("doc_id", "ts", "value"), right, on="ts", by="doc_id",
        strategy="auto", heavy_keys=heavy,
    ).na.fill({"last_purchase_value": 0.0})
    weights = init_weights(
        window_size=W, n_features=2, rnn_hidden_dim=4,
        conditioning_dim=10, latent_dim=16,
    )
    z = windowed_encode(
        joined, "doc_id", "ts", ["value", "last_purchase_value"], None, W,
        weights, heavy_keys=heavy,
    )
    # sequence count via observe() on the forced write — a follow-up
    # count() would execute the whole asof+window+encode pipeline twice
    from pyspark.sql import Observation

    obs = Observation("n_sequences")
    z = z.observe(obs, F.count(F.lit(1)).alias("n"))
    _force(z)
    dt = time.time() - t0
    n = int(obs.get["n"])
    return n, dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    from feature_extractor_spark.session import get_spark

    spark = get_spark("bench", cores=cores)

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    # the fixture-compare contract queries only run where their committed
    # sf0.01 snapshot applies; the bench measures the underlying raw
    # pipelines (same names as previous rounds for comparability)
    from feature_extractor_spark.plans import entry_queries as eq

    qs["encoder_latents"] = eq.encoder_latents
    qs["encoder_vae_small_latents"] = eq.encoder_vae_small_latents_raw
    qs["curation_pipeline"] = _curation_query
    qs["curation_pipeline_lm"] = _curation_lm_query
    qs["curation_tokens_pipeline"] = _curation_tokens_query  # r6: payload path

    # driver row ceded r7 (slot to vocab_audit); kept as a bench series
    qs["w3_lag_lead"] = eq.w3_lag_lead

    # round-7 operator: best-fit whole-sequence bin packing on the synth
    # tokens table (sf-scaled rows like the curation composition)
    from pyspark.sql import functions as F_

    def _pack_bins_query(s, d):
        from feature_extractor_spark.operators.packing import pack_bins
        from feature_extractor_spark.sources.tokens import synth_tokens

        sfv = float(d.rstrip("/").split("sf")[-1]) if "sf" in d else 0.1
        n_rows = max(5_000, int(300_000 * sfv))
        tok = synth_tokens(s, n_rows=n_rows, n_docs=max(50, n_rows // 100))
        # n_shards pinned (the r8 default is a fixed 1024, chosen for
        # corpus scale): 128 keeps the series comparable with r7 (which
        # ran defaultParallelism*4 = 128 on the 32-core box) and keeps
        # per-shard packing meaningful at bench row counts
        return pack_bins(
            tok.withColumn(
                "sid", F_.concat("doc_id", F_.lit("#"), F_.col("ts").cast("string"))
            ),
            "sid",
            capacity=2048,
            n_shards=128,
        )

    qs["tokens_pack_bins"] = _pack_bins_query

    # round-8 operator: BPE apply-encoding of the documents table against
    # a fixed hand-built merges/vocab pair (deterministic; coverage is
    # intentionally partial — the merge loop cost, which is what this
    # measures, is coverage-independent)
    def _encode_bpe_query(s, d):
        from feature_extractor_spark.functions.text import encode_bpe

        pairs = [
            "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
            "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
            "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
        ]
        merges = [(i, p[0], p[1]) for i, p in enumerate(pairs)]
        syms = sorted(
            {c for p in pairs for c in p}
            | set(pairs)
            | {c + "</w>" for p in pairs for c in p}
        )
        vocab = [(t, i + 2) for i, t in enumerate(syms)]
        mdf = s.createDataFrame(merges, "rank int, left string, right string")
        vdf = s.createDataFrame(vocab, "token string, id int")
        docs = s.read.parquet(f"{d}/documents.parquet")
        return encode_bpe(docs, mdf, vdf, text_col="text", lowercase=True)

    qs["text_encode_bpe"] = _encode_bpe_query

    # round-9 operator: learn the merges table itself from the corpus —
    # the timed cost is the distributed word-frequency shuffle plus the
    # bounded driver-side merge loop (200 merges; the returned merges
    # frame is tiny, so the noop write adds nothing)
    def _learn_bpe_query(s, d):
        from feature_extractor_spark.functions.text import learn_bpe

        docs = s.read.parquet(f"{d}/documents.parquet")
        merges_df, _vocab_df = learn_bpe(
            docs, num_merges=200, min_count=2, lowercase=True
        )
        return merges_df

    qs["text_learn_bpe"] = _learn_bpe_query

    # round-9 operator: seed-set quality classifier. The "seed" is a
    # deterministic slice of the documents table (longest docs as the
    # quality proxy). The warm run FITS once per sf (bounded samples —
    # the fit cost is corpus-size-independent); timed runs measure the
    # corpus-scaling part: the map-only scoring pass + the hash-Pareto
    # keep — the fit-once score-everything operating point, same pattern
    # as ann_persisted_topk's warm index build.
    _clf_cache: dict = {}

    def _quality_clf_query(s, d):
        from pyspark.sql import functions as FF

        from feature_extractor_spark.functions.classifier import (
            quality_sample,
            score_quality,
            train_quality_classifier,
        )

        docs = s.read.parquet(f"{d}/documents.parquet")
        if d not in _clf_cache:
            seed_docs = docs.filter(FF.length("text") > 900)
            _clf_cache[d] = train_quality_classifier(
                seed_docs, docs, dim=1 << 16, iters=10, sample_per_class=2000,
            )
        w, b = _clf_cache[d]
        return quality_sample(score_quality(docs, w, b), alpha=1.0)

    qs["text_quality_classifier"] = _quality_clf_query

    # round-8 operator: perceptual image near-dup over distributively
    # generated P6 payloads. Pixels are hash-decorrelated per image (the
    # affine _synth_ppm pattern shares gradient SIGNS across images,
    # which collapses dHash to a handful of values — a pathological
    # density, not a benchmark); i % 997 plants exact-duplicate families
    # so the banded join still has real pairs to verify.
    def _image_near_dup_query(s, d):
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        from feature_extractor_spark.operators.multimodal import (
            image_near_dup_pairs,
        )

        sfv = float(d.rstrip("/").split("sf")[-1]) if "sf" in d else 0.1
        n = max(500, int(20_000 * sfv))
        schema = T.StructType(
            [
                T.StructField("media_id", T.StringType()),
                T.StructField("payload", T.BinaryType()),
            ]
        )
        def one(i: int) -> bytes:
            # seeded per-image RandomState: fully decorrelated pixels
            # (additive formulas keep near-constant horizontal deltas,
            # which collapses the gradient-sign hash)
            img = np.random.RandomState(i).randint(
                0, 256, (16, 16, 3)
            ).astype(np.uint8)
            return b"P6\n16 16\n255\n" + img.tobytes()

        def gen(batches):
            for pdf in batches:
                ids = [f"m_{int(i):07d}" for i in pdf["id"]]
                pays = [one(int(i) % 997) for i in pdf["id"]]
                yield pd.DataFrame({"media_id": ids, "payload": pays})

        media = s.range(n).mapInPandas(gen, schema)
        return image_near_dup_pairs(media, max_hamming=6)

    qs["image_near_dup"] = _image_near_dup_query

    _ann_dirs: dict = {}

    def _ann_persisted_query(s, d):
        import tempfile

        from pyspark.sql import functions as FF

        from feature_extractor_spark.operators.ann_index import (
            ann_index_topk,
            build_ann_index,
        )

        if d not in _ann_dirs:
            idx = tempfile.mkdtemp(prefix="fx_ann_idx_") + "/idx"
            emb = s.read.parquet(f"{d}/embeddings.parquet")
            build_ann_index(
                emb, idx, n_lists=32, m=8, k_codes=32, residual=True
            )
            _ann_dirs[d] = idx
        emb = s.read.parquet(f"{d}/embeddings.parquet")
        q = emb.filter(FF.pmod(FF.col("vec_id"), FF.lit(50)) == 0)
        return ann_index_topk(q, _ann_dirs[d], k=5, n_probe=4)

    qs["ann_persisted_topk"] = _ann_persisted_query

    # retired driver row, kept as a bench series (same raw operator)
    from feature_extractor_spark.operators.dedup import exact_dedup

    qs["dedup_exact"] = lambda s, d: exact_dedup(
        s.read.parquet(f"{d}/documents.parquet"), "doc_id", "text"
    )

    # noise protocol (BENCH.md): the committed artifact is min-of-N, not a
    # single draw — box-state variance at sf0.1 measured up to +-25%, and
    # min over repeated runs is the stable estimator of the kernel cost
    n_runs = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    # fixed tiny control query (VERDICT r5 item 7): a 1-row scan + count
    # whose cost is pure session/JVM/scheduler overhead — recorded with
    # every artifact so cross-round box-state drift (r5 measured a uniform
    # +15-45% from box aging alone) can be normalized out when comparing
    # BENCH_r{N}.json files. Same protocol as the queries: warm + min-of-N.
    # r9 (VERDICT r8 item 8): the control is INTERLEAVED — sampled before
    # the query sweep, after it, and after the parity block — because a
    # single up-front draw spread 0.12-0.61 s in r8 (cold first sample)
    # and left cross-round normalization ambiguous. The artifact carries
    # the per-phase samples plus BOTH estimators: min (the kernel-cost
    # floor, backward-compatible field) and median (robust to the cold
    # tail; bench_compare normalizes by it).
    def _control() -> list[float]:
        one = spark.read.parquet(f"{sf_dir}/region.parquet").limit(1)
        one.count()  # warm
        out = []
        for _ in range(n_runs):
            t0 = time.time()
            one.count()
            out.append(round(time.time() - t0, 4))
        return out

    control_phases: dict[str, list[float]] = {"before": _control()}

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (plan + JIT)
        warm_sec = time.time() - t0
        # expensive queries (composed pipelines) get min-of-TWO timed runs
        # (VERDICT r5 item 6: one run left the costliest entries the least
        # protocol-protected; two bounds runtime while still shedding the
        # single-draw box-state tail), everything else min-of-(n_runs-1)
        reps = 2 if warm_sec > 5.0 else n_runs - 1
        samples = []
        for _ in range(reps):  # warm run excluded from samples
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        timings[name] = round(min(samples), 3)

    control_phases["mid"] = _control()

    head_samples = []
    n_seq = 0
    for _ in range(n_runs):
        n_seq, sec = headline_pipeline(spark, sf_dir)
        head_samples.append(round(sec, 3))
    headline_sec = min(head_samples)
    seq_per_sec = n_seq / headline_sec if headline_sec > 0 else 0.0

    # reference-parity block: the reference's exact phase-4.2 workload
    # (25,200 rows, W=144, 54 feat/step, vae_small latent 32) measured
    # every round so BENCH_r{N} tracks the apples-to-apples number
    from tools.reference_parity_bench import run as parity_run

    # discarded warm run first (VERDICT r5 item 3: the r5 artifact's first
    # parity draw was 2.6x the second — JVM/cache state, not kernel cost),
    # then min-of-THREE timed runs (VERDICT r7 item 6: min-of-2 still drew
    # a 2.2x spread inside one artifact on an aged box; three draws bound
    # the tail) plus a control-normalized ratio so the one remaining
    # hand-argued number becomes mechanical: parity_normalized =
    # wall_sec / control_1row_count_sec — box drift hits numerator and
    # denominator together, so cross-round comparisons read this field
    # (bench_compare prints it)
    parity_run(spark)  # warm, discarded
    parity_samples = [parity_run(spark) for _ in range(3)]
    parity = min(parity_samples, key=lambda p: p["wall_sec"])
    parity["samples_wall_sec"] = [p["wall_sec"] for p in parity_samples]
    control_phases["after"] = _control()
    control_samples = [s for ph in control_phases.values() for s in ph]
    # legacy min field: min of the BEFORE phase only — the same protocol
    # position r6-r8 sampled, keeping the cross-round series continuous
    # (the interleaved mid-phase runs JIT-hot and draws ~4x lower, which
    # would discontinue every normalized comparison if min-of-all fed
    # the old field). The median spans ALL phases — that is its point.
    control_min = min(control_phases["before"])
    control_sorted = sorted(control_samples)
    mid = len(control_sorted) // 2
    control_median = (
        control_sorted[mid]
        if len(control_sorted) % 2
        else (control_sorted[mid - 1] + control_sorted[mid]) / 2
    )
    parity["parity_normalized"] = (
        round(parity["wall_sec"] / control_min, 1) if control_min > 0 else None
    )
    parity["parity_normalized_median"] = (
        round(parity["wall_sec"] / control_median, 1)
        if control_median > 0
        else None
    )

    print(
        json.dumps(
            {
                "metric": "asof+window+encoder pipeline wall-clock (headline); per-query secs in 'queries'",
                "value": round(headline_sec, 3),
                "unit": "sec",
                "protocol": f"min-of-{n_runs} (headline samples listed; per-query min of {n_runs - 1} timed runs after 1 warm; composed pipelines min-of-2; parity warm discarded then min-of-3, control-normalized ratio in parity_normalized)",
                "headline_samples": head_samples,
                "control_1row_count_sec": round(control_min, 4),
                "control_median_sec": round(control_median, 4),
                "control_samples": control_samples,
                "control_phases": control_phases,
                "queries": timings,
                "sf": sf,
                "sequences": n_seq,
                "sequences_per_sec": round(seq_per_sec, 1),
                "cores": cores,
                "reference_parity_w144": parity,
            }
        )
    )


if __name__ == "__main__":
    main()
