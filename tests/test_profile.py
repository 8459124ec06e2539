"""profile_columns: one-job dataset profiling over real testdata."""

from pyspark.sql import functions as F

from feature_extractor_spark.functions.profile import profile_columns


def test_profile_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prof = profile_columns(docs)
    p = {(r["column"], r["metric"]): r for r in prof.collect()}

    n = docs.count()
    assert p[("doc_id", "rows")]["value"] == n
    assert p[("doc_id", "nulls")]["value"] == 0
    # HLL distinct within 10% of truth
    true_d = docs.select("doc_id").distinct().count()
    assert abs(p[("doc_id", "distinct")]["value"] - true_d) / true_d < 0.1

    # numeric column gets exact min/max + percentiles in range
    mn = docs.agg(F.min("n_chars")).first()[0]
    mx = docs.agg(F.max("n_chars")).first()[0]
    assert p[("n_chars", "min")]["value"] == mn
    assert p[("n_chars", "max")]["value"] == mx
    assert mn <= p[("n_chars", "p50")]["value"] <= mx
    assert p[("n_chars", "p25")]["value"] <= p[("n_chars", "p99")]["value"]

    # string column gets length stats
    assert p[("text", "min_len")]["value"] >= 0
    assert p[("text", "avg_len")]["value"] > 0


def test_profile_arrays_nulls_and_single_job(spark):
    df = spark.createDataFrame(
        [(1, [1, 2, 3], None), (2, [4], "x"), (3, None, "yy")],
        "id int, arr array<int>, s string",
    )
    n_before = len(
        spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
    )
    prof = {(r["column"], r["metric"]): r["value"] for r in profile_columns(df).collect()}
    n_jobs = (
        len(spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None))
        - n_before
    )
    # one aggregate scan (possibly split by AQE) + the tiny long-format
    # collect — NOT a job per column/metric
    assert n_jobs <= 3, f"profiling ran {n_jobs} jobs"

    assert prof[("arr", "nulls")] == 1
    assert prof[("arr", "min_size")] == 1 and prof[("arr", "max_size")] == 3
    assert prof[("s", "nulls")] == 1
    assert prof[("s", "max_len")] == 2


def test_profile_column_names_containing_double_underscore(spark):
    """A column whose NAME contains '__' must profile under its own name
    with the right metrics (the unpivot keys are positional, not parsed
    from the agg alias)."""
    df = spark.createDataFrame(
        [(1, "ab"), (2, None), (None, "xyz")], "a__b int, s__t__u string"
    )
    prof = profile_columns(df)
    got = {(r["column"], r["metric"]): r["value"] for r in prof.collect()}
    assert got[("a__b", "nulls")] == 1.0
    assert got[("a__b", "min")] == 1.0 and got[("a__b", "max")] == 2.0
    assert got[("s__t__u", "nulls")] == 1.0
    assert got[("s__t__u", "max_len")] == 3.0
    assert {c for c, _ in got} == {"a__b", "s__t__u"}
