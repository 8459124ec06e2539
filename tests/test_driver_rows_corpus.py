"""Oracle parity for the round-6 corpus-curation driver rows (VERDICT r5
items 1-2): line_dedup, c4_clean_page and contamination replaced the
near-trivia text_token_counts / text_fingerprint / dedup_exact rows, so
the operators that MUTATE or GATE the training corpus are value-checked
by the driver's hard signal. These tests run the same Spark-vs-DuckDB
compare locally at sf0.001 and additionally prove the rows are
non-vacuous: the rules fire on real rows, and a deliberate parameter
perturbation flips the match red."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.plans.entry_queries import ENTRY_QUERIES, ORACLE_SQL

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = f"{TESTDATA}/sf0.001"
ROWS = ["line_dedup", "c4_clean_page", "contamination", "span_removal"]


def _oracle(name: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return con.sql(ORACLE_SQL[name]).df()


def _canon(pdf):
    import pandas as pd

    pdf = pdf.copy()
    pdf.columns = [str(c) for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", ROWS)
def test_corpus_driver_row_matches_duckdb_oracle(spark, name):
    got = _canon(ENTRY_QUERIES[name](spark, SF).toPandas())
    want = _canon(_oracle(name))
    assert list(got.columns) == list(want.columns)
    assert got.equals(want), f"{name}: value mismatch vs DuckDB oracle"


def test_corpus_driver_rows_are_non_vacuous(spark):
    """Each rule must actually fire on the testdata — an all-zero flag
    column would make the hash match trivially."""
    ld = _oracle("line_dedup")
    assert (ld.n_removed_lines > 0).sum() > 100  # banner/footer removed
    c4 = _oracle("c4_clean_page")
    for col in ("c4_too_short", "c4_has_lorem", "c4_has_brace", "c4_keep"):
        assert c4[col].sum() > 0, f"{col} never fires"
    ct = _oracle("contamination")
    assert ct.is_contaminated.sum() >= 20  # the planted %17 leaks
    assert (ct.is_contaminated == 0).sum() > 100  # and clean docs exist


def test_line_dedup_row_perturbation_flips_red(spark):
    """min_docs=4 instead of the row's 3 must diverge from the oracle —
    proves the hash checks the threshold, not just row shape."""
    from feature_extractor_spark.operators.dedup import line_dedup_corpus

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lined = docs.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 2 == 0, F.lit("nav: home | about | contact\n")
            ).otherwise(F.lit("")),
            F.regexp_replace(F.col("text"), " merge ", "\n"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("\ncopyright footer 2020")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    pert = (
        line_dedup_corpus(lined, "doc_id", "text", min_docs=4)
        .select(
            "doc_id",
            F.col("text").alias("clean_text"),
            F.col("n_removed_lines").cast("long").alias("n_removed_lines"),
        )
        .toPandas()
    )
    assert not _canon(pert).equals(_canon(_oracle("line_dedup")))


def test_span_removal_row_non_vacuous_and_perturbation_flips(spark):
    """The synthetic corpus carries real duplicated 20-grams, so the row
    must remove spans from a meaningful doc subset AND leave most docs
    byte-identical; min_len=25 instead of the row's 20 must diverge."""
    from feature_extractor_spark.operators.dedup import remove_duplicate_spans

    o = _oracle("span_removal")
    assert (o.n_dup_spans > 0).sum() >= 10
    assert (o.n_dup_spans == 0).sum() > 300

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pert = (
        remove_duplicate_spans(docs, "doc_id", "text", min_len=25)
        .select(
            "doc_id",
            F.col("text").alias("clean_text"),
            F.col("n_removed_tokens").cast("long").alias("n_removed_tokens"),
            F.col("n_dup_spans").cast("long").alias("n_dup_spans"),
        )
        .toPandas()
    )
    assert not _canon(pert).equals(_canon(o))


def test_tokens_chunking_row_parity_and_perturbation(spark):
    """The r6 tokens_chunking row: Spark chunking must match the DuckDB
    oracle that re-derives chunk geometry AND content probes from the
    generator formula; min_tail=7 instead of the row's 6 must diverge
    (the synthetic n_tok distribution produces 6-token tails), proving
    the hash checks the tail-drop rule, not just row shape."""
    from feature_extractor_spark.operators.packing import chunk_tokens
    from feature_extractor_spark.sources.tokens import synth_tokens

    got = _canon(ENTRY_QUERIES["tokens_chunking"](spark, SF).toPandas())
    want = _canon(_oracle("tokens_chunking"))
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)
    # non-vacuous: multi-chunk sequences occur, and the tail-drop rule
    # keeps the total under the no-drop ceiling of 4 chunks/sequence
    assert (want.chunk_id > 0).sum() > 500
    assert 4000 < len(want) < 4000 * 4

    tok = synth_tokens(spark, n_rows=4000, n_docs=50, heavy_share=5)
    pert = (
        chunk_tokens(tok, max_len=24, overlap=4, min_tail=7)
        .select(
            "doc_id",
            F.unix_timestamp("ts").alias("unix_ts"),
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("chunk_start").cast("int").alias("chunk_start"),
            F.col("chunk_n_tok").cast("int").alias("chunk_n_tok"),
            F.element_at("chunk_tokens", 1).alias("first_token"),
            F.element_at("chunk_tokens", -1).alias("last_token"),
            F.aggregate(
                "chunk_tokens",
                F.lit(0).cast("long"),
                lambda acc, t: acc + t.cast("long"),
            ).alias("token_sum"),
        )
        .toPandas()
    )
    assert not _canon(pert).equals(want)
