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
