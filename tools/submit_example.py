"""spark-submit entry point (north rule deployment shape).

Runs the headline stage — as-of join (LOCF) + sliding-window build +
encoder forward — end to end on a cluster, importing the engine from the
--py-files zip (this file deliberately does NOT sys.path-hack the repo in:
if the zip is missing a module, the job fails, which is the point of the
smoke).

    python tools/make_pyfiles.py
    spark-submit --master <master> \
        --py-files dist/feature_extractor_spark.zip \
        tools/submit_example.py \
        --sf-dir /root/testdata/sf0.001 --output /tmp/fx_submit_out

On a real cluster add the usual sizing flags (--num-executors,
--executor-cores, --executor-memory); the engine itself only assumes AQE
and Arrow, which the session it is HANDED already has or the cluster conf
provides (spark-submit owns the session here, so session.get_spark is not
used).
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--window", type=int, default=16)
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("fx-submit-example")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    # imports resolve against the --py-files zip on both driver and executors
    from feature_extractor_spark.encoder import init_weights
    from feature_extractor_spark.operators.asof import asof_join
    from feature_extractor_spark.operators.fused import windowed_encode
    from feature_extractor_spark.operators.skew import detect_heavy_hitters

    ev = spark.read.parquet(f"{args.sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("doc_id"), "ts", "value", "event_type"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "doc_id", "ts", F.col("value").alias("last_purchase_value")
    )
    heavy = detect_heavy_hitters(ev, "doc_id", threshold_share=0.02)
    joined = asof_join(
        ev.select("doc_id", "ts", "value"), right, on="ts", by="doc_id",
        strategy="auto", heavy_keys=heavy,
    ).na.fill({"last_purchase_value": 0.0})
    weights = init_weights(
        window_size=args.window, n_features=2, rnn_hidden_dim=4,
        conditioning_dim=10, latent_dim=16,
    )
    z = windowed_encode(
        joined, "doc_id", "ts", ["value", "last_purchase_value"], None,
        args.window, weights, heavy_keys=heavy,
    )
    z.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"SUBMIT_OK rows={n}")
    spark.stop()


if __name__ == "__main__":
    main()
