"""Round-10 optimization harness (bench.py is FROZEN for measurement; this
file holds the extra instrumentation the optimization round needs).

Modes:

  python bench_extra.py time q1_pricing_summary simhash_near_dup
      warm + min-of-N noop-sink timing for the named bench queries
      (same query constructors as bench.py, same env contract).

  python bench_extra.py stages curation_tokens_pipeline
      run ONE query with the Spark event log on and print per-stage
      wall / task-sum / straggler breakdown (guide §1.1/§7.1 — the
      UI is disabled in this sandbox, so the event log is the UI).

  python bench_extra.py explain q1_pricing_summary [outfile]
      capture .explain("formatted") for a query (guide §7.2); used to
      commit plans/r10/<query>_{before,after}.txt.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_RUNS (default 3).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _bench_queries(spark):
    """The exact query-name -> constructor map bench.py times, built by
    reusing bench.py's own module (no duplication; bench.py stays the
    single source of what each name means)."""
    import bench as bench_mod
    import __spark_entry__ as entry_mod
    from feature_extractor_spark.plans import entry_queries as eq

    qs = entry_mod.queries()
    qs["encoder_latents"] = eq.encoder_latents
    qs["encoder_vae_small_latents"] = eq.encoder_vae_small_latents_raw
    qs["curation_pipeline"] = bench_mod._curation_query
    qs["curation_pipeline_lm"] = bench_mod._curation_lm_query
    qs["curation_tokens_pipeline"] = bench_mod._curation_tokens_query
    qs["w3_lag_lead"] = eq.w3_lag_lead

    # bench.main()-local closures re-created here with the same bodies
    # (they are small and parameter-free; bench.py keeps them in main())
    from pyspark.sql import functions as F_

    def _pack_bins_query(s, d):
        from feature_extractor_spark.operators.packing import pack_bins
        from feature_extractor_spark.sources.tokens import synth_tokens

        sfv = float(d.rstrip("/").split("sf")[-1]) if "sf" in d else 0.1
        n_rows = max(5_000, int(300_000 * sfv))
        tok = synth_tokens(s, n_rows=n_rows, n_docs=max(50, n_rows // 100))
        return pack_bins(
            tok.withColumn(
                "sid", F_.concat("doc_id", F_.lit("#"), F_.col("ts").cast("string"))
            ),
            "sid",
            capacity=2048,
            n_shards=128,
        )

    qs["tokens_pack_bins"] = _pack_bins_query

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

    def _learn_bpe_query(s, d):
        from feature_extractor_spark.functions.text import learn_bpe

        docs = s.read.parquet(f"{d}/documents.parquet")
        merges_df, _vocab_df = learn_bpe(
            docs, num_merges=200, min_count=2, lowercase=True
        )
        return merges_df

    qs["text_learn_bpe"] = _learn_bpe_query

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
        from pyspark.sql import functions as FF

        from feature_extractor_spark.operators.ann_index import (
            ann_index_topk,
            build_ann_index,
        )

        if d not in _ann_dirs:
            idx = tempfile.mkdtemp(prefix="fx_ann_idx_") + "/idx"
            emb = s.read.parquet(f"{d}/embeddings.parquet")
            build_ann_index(emb, idx, n_lists=32, m=8, k_codes=32, residual=True)
            _ann_dirs[d] = idx
        emb = s.read.parquet(f"{d}/embeddings.parquet")
        q = emb.filter(FF.pmod(FF.col("vec_id"), FF.lit(50)) == 0)
        return ann_index_topk(q, _ann_dirs[d], k=5, n_probe=4)

    qs["ann_persisted_topk"] = _ann_persisted_query

    from feature_extractor_spark.operators.dedup import exact_dedup

    qs["dedup_exact"] = lambda s, d: exact_dedup(
        s.read.parquet(f"{d}/documents.parquet"), "doc_id", "text"
    )
    return qs


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def cmd_time(names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    from feature_extractor_spark.session import get_spark

    spark = get_spark("bench-extra", cores=cores)
    qs = _bench_queries(spark)
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"{name}: warm")
        t0 = time.time()
        _force(qs[name](spark, sf_dir))
        warm = time.time() - t0
        samples = []
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"{name}: timed {i}")
            t0 = time.time()
            _force(qs[name](spark, sf_dir))
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"warm": round(warm, 3), "min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print("RESULT " + json.dumps(out))


def cmd_stages(name: str) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    log_dir = tempfile.mkdtemp(prefix="fx_eventlog_")
    from feature_extractor_spark.session import get_spark

    spark = get_spark(
        "bench-extra-stages",
        cores=cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    qs = _bench_queries(spark)
    spark.sparkContext.setJobDescription(f"{name}: warm")
    _force(qs[name](spark, sf_dir))
    spark.sparkContext.setJobDescription(f"{name}: profiled run")
    t0 = time.time()
    _force(qs[name](spark, sf_dir))
    wall = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()
    print(f"TOTAL wall (timed run 2 of 2): {wall:.2f}s")

    candidates = (
        [os.path.join(log_dir, app_id)]
        + glob.glob(os.path.join(log_dir, f"eventlog_v2_{app_id}", "events_*"))
        + glob.glob(os.path.join(log_dir, "**", "events_*"), recursive=True)
    )
    path = next(p for p in candidates if os.path.isfile(p))
    stages: dict = {}
    profiled = False
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                profiled = "profiled" in desc
                if profiled:
                    for sid in ev.get("Stage IDs", []):
                        stages.setdefault(sid, {})["profiled"] = True
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                st = stages.setdefault(sid, {})
                st["name"] = si.get("Name", "")[:60]
                st["tasks"] = si.get("Number of Tasks")
                st["wall"] = (
                    si.get("Completion Time", 0) - si.get("Submission Time", 0)
                ) / 1000
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                info = ev.get("Task Info", {})
                dur = (info.get("Finish Time", 0) - info.get("Launch Time", 0)) / 1000
                st = stages.setdefault(sid, {})
                st["task_sum"] = st.get("task_sum", 0) + dur
                st["task_max"] = max(st.get("task_max", 0), dur)
    print(f"{'stage':>5} {'wall':>7} {'tasksum':>8} {'taskmax':>8} {'n':>4}  name")
    tot = 0.0
    for sid in sorted(stages):
        s = stages[sid]
        if not s.get("profiled") or s.get("wall", 0) < 0.05:
            continue
        tot += s.get("wall", 0)
        print(
            f"{sid:>5} {s.get('wall',0):>7.2f} {s.get('task_sum',0):>8.1f} "
            f"{s.get('task_max',0):>8.2f} {s.get('tasks',0):>4}  {s.get('name','')}"
        )
    print(f"stage-wall sum (profiled run): {tot:.2f}s of {wall:.2f}s wall")


def cmd_explain(name: str, outfile: str | None) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from feature_extractor_spark.session import get_spark

    spark = get_spark("bench-extra-explain", cores=cores)
    qs = _bench_queries(spark)
    df = qs[name](spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    if outfile:
        with open(outfile, "w") as f:
            f.write(txt)
        print(f"wrote {outfile} ({len(txt)} bytes)")
    else:
        print(txt)


def main() -> None:
    mode = sys.argv[1]
    if mode == "time":
        cmd_time(sys.argv[2:])
    elif mode == "stages":
        cmd_stages(sys.argv[2])
    elif mode == "explain":
        cmd_explain(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
