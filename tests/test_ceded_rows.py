"""DuckDB oracle parity for driver rows CEDED in round 7 (VERDICT r6
item 1): w3_lag_lead, p1_target_selection and o4_ts_range_split gave
their registry slots to vocab_audit / unicode_normalize /
paragraph_dedup, so this module keeps the exact same Spark-vs-DuckDB
value check alive in pytest — same sf0.01 data, same oracle SQL, same
exactness — per the r5/r6 convention that ceded rows remain
oracle-covered (see e.g. tests/test_driver_rows_corpus.py)."""

import os

import duckdb
import pandas as pd

from feature_extractor_spark.plans.entry_queries import (
    O4_SPLIT_ORACLE_SQL,
    _p1_target_sql,
    o4_ts_range_split,
    p1_target_selection,
    w3_lag_lead,
)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = f"{TESTDATA}/sf0.01"

# w3's oracle, verbatim from its (now ceded) registry entry
W3_ORACLE_SQL = """
    SELECT event_id, user_id, ts, value,
           lag(value, 1)  OVER w AS value_lag_1,
           lag(value, 3)  OVER w AS value_lag_3,
           lead(value, 1) OVER w AS value_lead_1
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    """


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    return con.sql(sql).df()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf.columns = [str(c) for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


def test_w3_lag_lead_matches_duckdb(spark):
    got = _canon(w3_lag_lead(spark, SF).toPandas())
    want = _canon(_oracle(W3_ORACLE_SQL))
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)


def test_p1_target_selection_matches_duckdb(spark):
    got = _canon(p1_target_selection(spark, SF).toPandas())
    want = _canon(_oracle(_p1_target_sql()))
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)


def test_o4_ts_range_split_matches_duckdb(spark):
    got = _canon(o4_ts_range_split(spark, SF).toPandas())
    want = _canon(_oracle(O4_SPLIT_ORACLE_SQL))
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)


def test_p8_returns_matches_duckdb(spark):
    from feature_extractor_spark.plans.entry_queries import (
        P8_RETURNS_ORACLE_SQL,
        p8_returns,
    )

    got = _canon(p8_returns(spark, SF).toPandas())
    want = _canon(_oracle(P8_RETURNS_ORACLE_SQL))
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)


def test_s7_json_scalar_matches_duckdb(spark):
    """Ceded r8 (slot given to pack_bins_bfd): same value check as the
    old registry row."""
    from feature_extractor_spark.plans.entry_queries import (
        S7_JSON_ORACLE_SQL,
        s7_json_scalar,
    )

    got = _canon(s7_json_scalar(spark, SF).toPandas())
    exp = _canon(_oracle(S7_JSON_ORACLE_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_j1_doc_token_join_matches_duckdb(spark):
    """Ceded r8 (slot given to encode_bpe_subword): same value check as
    the old registry row — two shuffle joins + per-doc aggregate."""
    from feature_extractor_spark.plans.entry_queries import (
        J1_DOC_TOKEN_ORACLE_SQL,
        j1_doc_token_join,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    got = _canon(j1_doc_token_join(spark, SF).toPandas())
    exp = _canon(con.sql(J1_DOC_TOKEN_ORACLE_SQL).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_emb_near_dup_lsh_matches_duckdb(spark):
    """Ceded r9 (slot given to ann_persisted_topk): same value check as
    the old registry row — LSH-bucketed near-dup pairs equal the exact
    cosine pair set at the contract's (n_planes, n_tables)."""
    from feature_extractor_spark.plans.entry_queries import (
        EMB_NEAR_DUP_LSH_ORACLE_SQL,
        emb_near_dup_lsh,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    got = _canon(emb_near_dup_lsh(spark, SF).toPandas())
    exp = _canon(con.sql(EMB_NEAR_DUP_LSH_ORACLE_SQL).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
