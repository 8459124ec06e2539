"""Generate the committed golden-latent fixtures (VERDICT r3 item 3).

The NN-forward contract queries (no TensorFlow in the container -> no
SQL-expressible oracle) are value-checked against parquet snapshots of
their own sf0.01 output, computed ONCE here on local[1] (single JVM
thread, single Python worker: the closest this environment gets to a
single-process run) and committed to git under tests/fixtures/latents/.

The driver-side contract then becomes a true numeric check: the
distributed query full-outer-joins the fixture and emits fixture values +
a per-row match flag, while the DuckDB oracle reads the SAME file — any
distributed-path divergence (kernel regression, weight perturbation,
dropped rows) flips the value hash red.

Regeneration is DELIBERATE (weights or pipeline semantics changed):
    python tools/make_latent_fixtures.py
then review the diff before committing. The script also self-verifies:
after writing, each contract query is executed and must report match=1 on
every row.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("FIXTURE_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "latents",
)


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feature_extractor_spark.session import get_spark

    spark = get_spark("make-latent-fixtures", cores=1)

    from feature_extractor_spark.plans import entry_queries as eq

    jobs = [
        ("encoder_vae_small_latents", eq.encoder_vae_small_latents_raw,
         ["user_id", "ts_us"]),
        ("encoder_cnn_latents", eq.encoder_cnn_latents_raw,
         ["user_id", "ts_us"]),
        ("u2_decoder_roundtrip", eq.u2_decoder_roundtrip_raw,
         ["path", "user_id", "ts_us"]),
        ("fused_windowed_encode", eq.fused_windowed_encode_raw,
         ["doc_id", "ts_us"]),
        ("u1_golden_transformer_latents", eq.u1_golden_transformer_latents_raw,
         ["user_id", "ts_us"]),
        ("a8_best_latent_search", eq.a8_best_latent_search_raw,
         ["latent_dim"]),
    ]
    os.makedirs(OUT_DIR, exist_ok=True)
    sf_name = os.path.basename(os.path.normpath(SF_DIR))
    for name, raw_fn, keys in jobs:
        pdf = raw_fn(spark, SF_DIR).toPandas().sort_values(keys).reset_index(drop=True)
        path = os.path.join(OUT_DIR, f"{name}_{sf_name}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            path,
            compression="zstd",
        )
        print(f"wrote {path}: {len(pdf)} rows, {os.path.getsize(path)} bytes")

    # self-verify: the contract query must be all-green against what we
    # just wrote (catches key mismatches / tolerance problems immediately)
    registry = dict(eq.ENTRY_QUERIES)
    for name, _, _ in jobs:
        out = registry[name](spark, SF_DIR)
        n = out.count()
        bad = out.filter("is_match != 1").count()
        status = "OK" if bad == 0 and n > 0 else "FAIL"
        print(f"verify {name}: {n} rows, {bad} mismatches -> {status}")
        if status == "FAIL":
            raise SystemExit(f"fixture self-verify failed for {name}")


if __name__ == "__main__":
    main()
