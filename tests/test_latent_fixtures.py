"""Golden-latent fixture contract (VERDICT r3 item 3): the committed
sf0.01 parquet snapshots turn the NN-forward driver rows into true value
checks. These tests pin the MECHANISM — a perturbed engine output, a
dropped row, or an extra row must all flip the contract red — and run one
real distributed forward against its fixture end to end."""

import duckdb
import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.plans.entry_queries import (
    ENTRY_QUERIES,
    ORACLE_SQL,
    _fixture_compare,
    _fixture_path,
)

SF = "/root/testdata/sf0.01"
KEYS = ["user_id", "ts_us"]
NAME = "encoder_cnn_latents"


@pytest.fixture(scope="module")
def fx(spark):
    return spark.read.parquet(_fixture_path(NAME, SF))


def test_identical_engine_output_matches_everywhere(spark, fx):
    out = _fixture_compare(fx, NAME, SF, KEYS)
    n = out.count()
    assert n == fx.count() > 0
    assert out.filter("is_match != 1").count() == 0


def test_value_perturbation_flips_red(spark, fx):
    """A numeric drift beyond atol (e.g. a weight perturbation downstream)
    must zero the match flag on the affected rows."""
    pert = fx.withColumn("z_checksum", F.col("z_checksum") + 0.01)
    bad = _fixture_compare(pert, NAME, SF, KEYS)
    assert bad.filter("is_match = 1").count() == 0
    # sub-tolerance jitter (distributed fp noise) must stay green
    tiny = fx.withColumn("z_checksum", F.col("z_checksum") + 1e-7)
    assert _fixture_compare(tiny, NAME, SF, KEYS).filter("is_match != 1").count() == 0


def test_dropped_and_extra_rows_surface(spark, fx):
    n = fx.count()
    # dropped engine rows -> fixture-only rows with is_match=0
    missing = _fixture_compare(fx.limit(10), NAME, SF, KEYS)
    assert missing.filter("is_match = 0").count() == n - 10
    # extra engine rows -> extra output rows (oracle row count diverges)
    extra_rows = fx.limit(1).withColumn("ts_us", F.col("ts_us") + F.lit(999))
    extra = _fixture_compare(fx.unionByName(extra_rows), NAME, SF, KEYS)
    assert extra.count() == n + 1
    assert extra.filter("is_match = 0").count() == 1


def test_duckdb_oracle_reads_same_fixture(spark):
    """Driver-shaped check: the DuckDB oracle of the fixture query reads
    the identical file and expects is_match=1 on every row — row counts
    and match values line up with the Spark side."""
    duck = duckdb.sql(ORACLE_SQL[NAME]).df()
    assert len(duck) > 0 and (duck["is_match"] == 1).all()
    sp = _fixture_compare(
        spark.read.parquet(_fixture_path(NAME, SF)), NAME, SF, KEYS
    ).toPandas()
    assert len(sp) == len(duck)
    assert sorted(sp.columns) == sorted(duck.columns)


def test_distributed_forward_matches_committed_fixture(spark):
    """End to end: the real distributed cnn forward at local[*] must
    reproduce the committed local[1] snapshot value-for-value."""
    out = ENTRY_QUERIES[NAME](spark, SF)
    assert out.filter("is_match != 1").count() == 0


def test_other_sf_raises_clearly(spark):
    with pytest.raises(FileNotFoundError, match="sf0.1"):
        ENTRY_QUERIES[NAME](spark, "/root/testdata/sf0.1")


def test_pq_codebook_fixture_green_and_perturbation_flips_red(spark):
    """pq_topk_adc contract: the DuckDB oracle RECOMPUTES code assignment
    + ADC distances from the committed codebook parquet, so (a) the
    unperturbed engine output must equal the oracle value-for-value, and
    (b) a deliberately perturbed codebook must change the engine's
    result set (the driver's hash would go red)."""
    import numpy as np
    import pyarrow.parquet as pq_reader

    from feature_extractor_spark.operators.similarity import pq_encode, pq_topk

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    oracle = {
        (r[0], r[1], round(r[2], 6))
        for r in con.execute(ORACLE_SQL["pq_topk_adc"]).fetchall()
    }

    sp = ENTRY_QUERIES["pq_topk_adc"](spark, SF).collect()
    got = {(r["query_id"], r["neighbor_id"], round(r["adc_distance"], 6)) for r in sp}
    assert got == oracle and len(got) == 50

    # perturb one codeword: codes and/or distances shift -> sets diverge
    tbl = pq_reader.read_table(_fixture_path("pq_codebooks", SF)).to_pandas()
    tbl = tbl.sort_values(["s", "code"])
    books = np.asarray(
        [np.asarray(c, dtype=np.float64) for c in tbl["centroid"]]
    ).reshape(8, 16, -1)
    books[0, 0] += 0.05
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter("vec_id % 50 = 0")
    pert = pq_topk(q, pq_encode(emb, books), books, k=5).collect()
    pert_set = {
        (r["query_id"], r["neighbor_id"], round(r["adc_distance"], 6)) for r in pert
    }
    assert pert_set != oracle


def test_fixture_keys_survive_non_utc_session_timezone(spark):
    """_ts_us must be zone-independent: under a non-UTC session timezone
    the contract query still matches the committed (UTC-generated)
    fixture on every row (ADVICE r4: a session-zone cast shifted every
    key and deterministically false-failed the whole board)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        out = ENTRY_QUERIES[NAME](spark, SF)
        assert out.filter("is_match != 1").count() == 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_ann_model_fixture_matches_fresh_build(spark, tmp_path):
    """ann_persisted_topk contract: the committed centroid/codebook
    fixture must be BIT-EQUAL to what build_ann_index trains with the
    row's parameters — a drifted trainer (numpy change, edited params)
    fails here before it silently flips the driver row red. Also pins
    that a perturbed model changes the engine's result set."""
    import numpy as np
    import pyarrow.parquet as pq_reader

    from feature_extractor_spark.operators.ann_index import build_ann_index
    from feature_extractor_spark.plans.entry_queries import _ANN_ROW_PARAMS

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    build_ann_index(emb, idx, **_ANN_ROW_PARAMS)

    fresh_c = pq_reader.read_table(idx + "/centroids").to_pandas()
    fresh_c = fresh_c.sort_values("cell").reset_index(drop=True)
    fix_c = pq_reader.read_table(
        _fixture_path("ann_centroids", SF)
    ).to_pandas().sort_values("cell").reset_index(drop=True)
    assert list(fresh_c["cell"]) == list(fix_c["cell"])
    assert np.array_equal(
        np.asarray([np.asarray(v) for v in fresh_c["centroid"]]),
        np.asarray([np.asarray(v) for v in fix_c["centroid"]]),
    )
    fresh_b = pq_reader.read_table(idx + "/codebooks").to_pandas()
    fresh_b = fresh_b.sort_values(["subspace", "code"]).reset_index(drop=True)
    fix_b = pq_reader.read_table(
        _fixture_path("ann_codebooks", SF)
    ).to_pandas().sort_values(["subspace", "code"]).reset_index(drop=True)
    assert np.array_equal(
        np.asarray([np.asarray(v) for v in fresh_b["vec"]]),
        np.asarray([np.asarray(v) for v in fix_b["vec"]]),
    )

    # engine output vs the oracle, value for value (the driver's check)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    oracle = {
        (r[0], r[1], round(r[2], 6), r[3])
        for r in con.execute(ORACLE_SQL["ann_persisted_topk"]).fetchall()
    }
    sp = ENTRY_QUERIES["ann_persisted_topk"](spark, SF).collect()
    got = {
        (r["query_id"], r["neighbor_id"], round(r["adc_distance"], 6), r["rank"])
        for r in sp
    }
    assert got == oracle and len(got) == 50
