"""Char-trigram LM quality scoring (CCNet-style signal)."""

from pyspark.sql import functions as F

from feature_extractor_spark.functions.lm import lm_score, train_char_lm


def test_lm_separates_in_domain_from_gibberish(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_char_lm(docs, sample_size=300)
    assert model["vocab"] > 5 and len(model["tri"]) > 100

    in_domain = docs.limit(50).select("doc_id", "text")
    import random

    rnd = random.Random(7)
    gib_rows = [
        (
            f"g{i}",
            "".join(rnd.choice("qxzjvkw#@%&*~^]}|") for _ in range(400)),
        )
        for i in range(20)
    ]
    gibberish = spark.createDataFrame(gib_rows, "doc_id string, text string")

    s_in = lm_score(in_domain, model).agg(F.avg("lm_bits_per_char")).first()[0]
    s_gib = lm_score(gibberish, model).agg(F.avg("lm_bits_per_char")).first()[0]
    # in-domain text must be clearly more probable than line noise
    assert s_in + 1.0 < s_gib, (s_in, s_gib)

    # deterministic: same model, same scores
    m2 = train_char_lm(docs, sample_size=300)
    s_in2 = lm_score(in_domain, m2).agg(F.avg("lm_bits_per_char")).first()[0]
    assert abs(s_in - s_in2) < 1e-12


def test_lm_score_edge_cases(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_char_lm(docs, sample_size=100)
    df = spark.createDataFrame(
        [("a", ""), ("b", None), ("c", "x")], "doc_id string, text string"
    )
    got = {r["doc_id"]: r["lm_bits_per_char"] for r in lm_score(df, model).collect()}
    assert got["a"] is None and got["b"] is None
    assert got["c"] is not None and got["c"] > 0
