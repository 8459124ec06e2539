"""S1-S5 loader semantics (reference load_csv parity) + CLI pipeline smoke."""

import os

import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.sources.loaders import load_csv, write_csv


def test_load_csv_reference_semantics(spark, tmp_path):
    """DATE_TIME detection, numeric coercion errors->0.0, row cap."""
    p = tmp_path / "in.csv"
    p.write_text(
        "DATE_TIME,OPEN,CLOSE,NOTE\n"
        "2024-01-01 00:00:00,1.5,2.5,hello\n"
        "2024-01-01 01:00:00,oops,3.5,world\n"
        "2024-01-01 02:00:00,2.0,,x\n"
        "2024-01-01 03:00:00,9.0,9.5,y\n"
    )
    df = load_csv(spark, str(p), headers=True)
    rows = df.orderBy("ts").collect()
    assert df.columns[0] == "ts"
    assert [r["OPEN"] for r in rows] == [1.5, 0.0, 2.0, 9.0]  # 'oops' -> 0.0
    assert [r["CLOSE"] for r in rows] == [2.5, 3.5, 0.0, 9.5]  # empty -> 0.0
    assert rows[0]["ts"].hour == 0

    capped = load_csv(spark, str(p), headers=True, max_rows=2)
    assert capped.count() == 2


def test_load_csv_headerless_col_naming(spark, tmp_path):
    """S4: col_0..col_{n-1} (reference app/data_handler.py:57-58)."""
    p = tmp_path / "h.csv"
    p.write_text("1.0,2.0,3.0\n4.0,5.0,6.0\n")
    df = load_csv(spark, str(p), headers=False)
    assert df.columns == ["col_0", "col_1", "col_2"]
    assert df.count() == 2


def test_write_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "out"
    df = spark.createDataFrame([(1.0, 2.0), (3.0, 4.0)], "a double, b double")
    write_csv(df, str(p), single_file=True)
    back = spark.read.csv(str(p), header=True, inferSchema=True)
    assert sorted([tuple(r) for r in back.collect()]) == [(1.0, 2.0), (3.0, 4.0)]


def test_encoder_pipeline_cli(spark, tmp_path, sf_small):
    """CLI pipeline end-to-end: events parquet in -> latents parquet out."""
    from feature_extractor_spark.plans.pipeline import encoder_pipeline

    ev = spark.read.parquet(f"{sf_small}/events.parquet").select(
        F.col("user_id").cast("string").alias("doc_id"), "ts", "value"
    )
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    out = encoder_pipeline(
        spark, spark.read.parquet(src), "doc_id", "ts", ["value"],
        window_size=8, latent_dim=8,
    )
    dst = str(tmp_path / "latents")
    out.write.parquet(dst)
    got = spark.read.parquet(dst)
    assert got.count() > 0
    assert "z_mean" in got.columns
    assert len(got.first()["z_mean"]) == 8


def test_o3_union_distinct_matches_duckdb(spark, sf_small):
    """O3 union + distinct (formerly the o3_union_distinct driver row; its
    registry slot now carries pq_topk_adc — see plans/entry_queries.py)."""
    import duckdb

    r = spark.read.parquet(f"{sf_small}/region.parquet").select(
        F.col("r_name").alias("name")
    )
    n = spark.read.parquet(f"{sf_small}/nation.parquet").select(
        F.col("n_name").alias("name")
    )
    got = {row["name"] for row in r.unionByName(n).distinct().collect()}
    exp = {
        row[0]
        for row in duckdb.sql(
            f"""
            SELECT name FROM (
              SELECT r_name AS name FROM read_parquet('{sf_small}/region.parquet')
              UNION ALL
              SELECT n_name AS name FROM read_parquet('{sf_small}/nation.parquet')
            ) GROUP BY name
            """
        ).fetchall()
    }
    assert got == exp and len(got) > 0
