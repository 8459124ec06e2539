"""Round-8 driver rows: the pack_bins_bfd full-recomputation oracle is a
real signal — value-equal on the true configuration, and RED under a
capacity or fit-rule perturbation (the discipline every r6+ hard oracle
follows: a check that cannot flip red checks nothing)."""

import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.plans.entry_queries import (
    _PACK_BINS_ORACLE,
    _PACK_CAP,
    pack_bins_bfd,
)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = f"{TESTDATA}/sf0.01"


def _oracle() -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return con.sql(_PACK_BINS_ORACLE).df()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        if pd.api.types.is_bool_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(bool)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


def test_pack_bins_bfd_row_matches_duckdb_recomputation(spark):
    got = _canon(pack_bins_bfd(spark, SF).toPandas())
    exp = _canon(_oracle())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the data puts real mass on multi-item bins (not all singletons)
    per_bin = got.groupby("bin_id").size()
    assert (per_bin > 1).sum() > 10


def test_pack_bins_bfd_row_flips_red_on_capacity_and_fit(spark):
    """A capacity-1 shift OR swapping best-fit for first-fit must change
    assignments vs the oracle — proving the oracle pins the exact BFD
    contract, not just 'some packing'."""
    from feature_extractor_spark.operators.packing import pack_bins
    from feature_extractor_spark.sources import load_table

    exp = _canon(_oracle())
    docs = load_table(spark, SF, "documents")
    items = docs.select(
        "doc_id", (F.col("n_chars") % 300 + 1).cast("int").alias("n_tok")
    )

    def run(**kw):
        out = pack_bins(items, "doc_id", n_tok_col="n_tok", n_shards=1, **kw)
        return _canon(
            out.select("doc_id", "n_tok", "bin_id", "bin_fill", "oversize")
            .toPandas()
        )

    wrong_cap = run(capacity=_PACK_CAP - 1)
    assert not wrong_cap.equals(exp)
    wrong_fit = run(capacity=_PACK_CAP, fit="first")
    assert not wrong_fit.equals(exp)
