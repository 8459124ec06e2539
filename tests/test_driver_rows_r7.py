"""Oracle parity + perturbation tests for the round-7 driver rows
(VERDICT r6 item 1): vocab_audit, unicode_normalize, paragraph_dedup
replaced the near-trivia w3_lag_lead / p1_target_selection /
o4_ts_range_split rows. Same discipline as tests/test_driver_rows_corpus:
run the Spark row vs its DuckDB oracle locally at sf0.001, prove the
rules fire on real rows, and prove a deliberate parameter perturbation
flips the match red. The ceded rows' own oracle checks live in
tests/test_ceded_rows.py."""

import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.plans.entry_queries import ENTRY_QUERIES, ORACLE_SQL

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = f"{TESTDATA}/sf0.001"

BOM = "\ufeff"
ZWSP = "\u200b"
CTRL = "\u0001"
COMBINING_ACUTE = "\u0301"


def _oracle(name: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return con.sql(ORACLE_SQL[name]).df()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf.columns = [str(c) for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize(
    "name", ["vocab_audit", "unicode_normalize", "paragraph_dedup"]
)
def test_r7_driver_row_matches_duckdb_oracle(spark, name):
    got = _canon(ENTRY_QUERIES[name](spark, SF).toPandas())
    want = _canon(_oracle(name))
    assert list(got.columns) == list(want.columns)
    assert got.equals(want), f"{name}: value mismatch vs DuckDB oracle"


def test_vocab_audit_non_vacuous_and_perturbation_flips(spark):
    """The deliberately small vocab_size=32768 must produce real OOV mass
    (the audit's entire point), and vocab_size=16384 must diverge —
    proves the hash checks the vocab bound, not just the top-k shape."""
    from feature_extractor_spark.functions.text import (
        token_freq_topk,
        vocab_coverage,
    )
    from feature_extractor_spark.sources.tokens import synth_tokens

    o = _oracle("vocab_audit")
    assert len(o) == 50
    assert (o.n_oov > 0).all() and (o.oov_frac.iloc[0] > 0.2)
    assert o.coverage.iloc[0] > 0.5  # the generator sweeps most of [0, 32768)

    tok = synth_tokens(spark, n_rows=4000, n_docs=50, heavy_share=5)
    cov = vocab_coverage(tok, "tokens", vocab_size=16384).select(
        F.col("n_docs").alias("corpus_n_seqs"),
        F.col("n_total").alias("corpus_n_tok"),
        "n_distinct", "n_distinct_in_vocab", "coverage", "n_oov", "oov_frac",
    )
    pert = (
        token_freq_topk(tok, "tokens", k=50)
        .crossJoin(cov)
        .select(
            F.col("token").cast("int").alias("token"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_total").cast("long").alias("n_total"),
            "corpus_n_seqs", "corpus_n_tok", "n_distinct",
            "n_distinct_in_vocab", "coverage", "n_oov", "oov_frac",
        )
        .toPandas()
    )
    assert not _canon(pert).equals(_canon(o))


def _unicode_lined(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 3 == 0, F.lit(BOM)).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit("Cafe" + COMBINING_ACUTE + ": ")
            ).otherwise(F.lit("")),
            F.regexp_replace(
                F.col("text"), " merge ", " me" + ZWSP + "rge" + CTRL + " "
            ),
        ).alias("text"),
    )


def test_unicode_normalize_row_non_vacuous_and_perturbation_flips(spark):
    """Every plant rule must actually rewrite text (BOM stripped, é
    composed, ZWSP/control removed restoring ' merge '), and form='NFD'
    instead of the row's NFC must diverge on the planted decomposed
    header — proves the hash checks the normalization form."""
    from feature_extractor_spark.functions.text import normalize_unicode

    o = _oracle("unicode_normalize")
    evens = o[o.doc_id % 2 == 0]
    assert evens.clean_text.str.startswith("Caf\u00e9: ").all()  # composed
    for bad in (BOM, ZWSP, CTRL, COMBINING_ACUTE):
        assert not o.clean_text.str.contains(bad).any()
    assert o.clean_text.str.contains(" merge ").any()  # splice reverted

    pert = (
        normalize_unicode(
            _unicode_lined(spark), "text", out_col="clean_text", form="NFD"
        )
        .select(
            "doc_id",
            "clean_text",
            F.length("clean_text").cast("long").alias("n_chars"),
        )
        .toPandas()
    )
    assert not _canon(pert).equals(_canon(o))


def test_paragraph_dedup_row_non_vacuous_and_perturbation_flips(spark):
    """The planted license header (evens) and bio box (doc_id%3) must be
    removed as whole PARAGRAPHS, and min_docs=4 must diverge from the
    row's 3 — same threshold-checking argument as the line_dedup test."""
    from feature_extractor_spark.operators.dedup import line_dedup_corpus

    o = _oracle("paragraph_dedup")
    assert (o.n_removed_paragraphs > 0).sum() > 100
    # multi-line blocks removed intact: no header/bio line survives
    assert not o.clean_text.str.contains("licensed under the synthetic").any()
    assert not o.clean_text.str.contains("version 2.0 terms apply").any()
    assert not o.clean_text.str.contains("author bio").any()

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lined = docs.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 2 == 0,
                F.lit(
                    "licensed under the synthetic license\n"
                    "version 2.0 terms apply\n\n"
                ),
            ).otherwise(F.lit("")),
            F.regexp_replace(F.col("text"), " merge ", "\n\n"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("\n\nauthor bio: a prolific writer\nof synthetic corpora"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    pert = (
        line_dedup_corpus(lined, "doc_id", "text", min_docs=4, sep="\n\n")
        .select(
            "doc_id",
            F.col("text").alias("clean_text"),
            F.col("n_removed_lines").cast("long").alias("n_removed_paragraphs"),
        )
        .toPandas()
    )
    assert not _canon(pert).equals(_canon(o))


def test_word_vocab_encode_non_vacuous_and_perturbation_flips(spark):
    """The deliberately tiny vocab (18 incl. 2 reserved, vs the corpus's
    31 distinct words) must leave real UNK mass on BOTH branches, and a
    different vocab_size must diverge — proves the hash checks the
    vocabulary fit, not just row shape."""
    from feature_extractor_spark.functions.text import (
        build_word_vocab,
        encode_words,
    )

    o = _oracle("word_vocab_encode")
    assert (o.n_unk > 0).sum() > 100  # hapax/overflow words -> UNK
    assert (o.n_unk < o.n_tok).sum() > 100  # but in-vocab ids dominate
    assert (o.n_tok > 0).all()

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vocab = build_word_vocab(docs, vocab_size=12, min_count=2)
    enc = encode_words(docs, vocab)
    t = F.col("tokens")
    pert = (
        enc.select(
            "doc_id",
            F.col("n_tok").cast("int").alias("n_tok"),
            F.element_at(t, 1).alias("first_token"),
            F.element_at(t, -1).alias("last_token"),
            F.aggregate(
                t, F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
            ).alias("token_sum"),
            F.size(F.filter(t, lambda x: x == 1)).cast("long").alias("n_unk"),
        )
        .toPandas()
    )
    assert not _canon(pert).equals(_canon(o))
