"""Sequence packing (operators/packing.py): two-phase global prefix sum
vs a pandas cumsum oracle, partition-count invariance, per-group variant,
interior-bin fullness."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.operators.packing import pack_sequences, packing_stats
from feature_extractor_spark.sources.tokens import synth_tokens


@pytest.fixture(scope="module")
def tok(spark):
    return synth_tokens(spark, n_rows=2000, n_docs=30, heavy_share=4).select(
        "doc_id", F.unix_timestamp("ts").alias("k"), "n_tok", "source"
    )


def _oracle(pdf: pd.DataFrame, ctx: int, by=None) -> pd.DataFrame:
    pdf = pdf.sort_values("k", kind="mergesort").reset_index(drop=True)
    if by:
        pdf["tok_start"] = (
            pdf.groupby(by)["n_tok"].cumsum() - pdf["n_tok"]
        )
    else:
        pdf["tok_start"] = pdf["n_tok"].cumsum() - pdf["n_tok"]
    pdf["bin_id"] = pdf["tok_start"] // ctx
    pdf["bin_pos"] = pdf["tok_start"] % ctx
    pdf["spans_boundary"] = (pdf["bin_pos"] + pdf["n_tok"]) > ctx
    return pdf


def test_global_packing_matches_pandas(spark, tok):
    got = pack_sequences(tok, "k", "n_tok", context_len=512).orderBy("k").toPandas()
    exp = _oracle(tok.toPandas(), 512)
    for c in ["tok_start", "bin_id", "bin_pos"]:
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy())
    assert got["spans_boundary"].tolist() == exp["spans_boundary"].tolist()


def test_packing_partition_invariance(spark, tok):
    a = pack_sequences(tok.repartition(1), "k", context_len=512).orderBy("k").toPandas()
    b = pack_sequences(tok.repartition(13), "k", context_len=512).orderBy("k").toPandas()
    np.testing.assert_array_equal(a["tok_start"].to_numpy(), b["tok_start"].to_numpy())


def test_per_group_packing(spark, tok):
    got = (
        pack_sequences(tok, "k", context_len=512, partition_col="source")
        .orderBy("k")
        .toPandas()
    )
    exp = _oracle(tok.toPandas(), 512, by="source")
    np.testing.assert_array_equal(
        got["tok_start"].to_numpy(), exp["tok_start"].to_numpy()
    )


def test_interior_bins_exactly_full(spark, tok):
    """Contiguous packing fills every interior bin to the brim: tokens
    STARTING in bin b plus the carry-in from a spanning predecessor cover
    exactly context_len for all but the last bin."""
    ctx = 512
    packed = pack_sequences(tok, "k", context_len=ctx).orderBy("k").toPandas()
    total = packed["n_tok"].sum()
    n_bins = -(-int(total) // ctx)
    stats = packing_stats(
        spark.createDataFrame(packed[["bin_id", "n_tok", "spans_boundary"]])
    ).toPandas()
    assert stats["bin_id"].tolist() == list(range(n_bins))
    # reconstruct per-bin occupancy from coordinates: every position of
    # every interior bin is covered exactly once
    occ = np.zeros(n_bins * ctx, dtype=np.int64)
    for s, n in zip(packed["tok_start"], packed["n_tok"]):
        occ[s : s + n] += 1
    assert (occ[: int(total)] == 1).all()
    assert (occ[int(total) :] == 0).all()
