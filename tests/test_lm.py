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


def test_lm_vectorized_matches_reference_scorer(spark):
    """The searchsorted hot path must reproduce the scalar dict-lookup
    reference scorer to float round-off (pairwise vs sequential summation
    is the only difference), including unseen trigrams, unseen contexts,
    unicode, and the max_chars truncation boundary."""
    from feature_extractor_spark.functions.lm import score_doc_py

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_char_lm(docs, sample_size=200)

    rows = [
        ("r0", "the quick brown fox jumps over the lazy dog. " * 30),
        ("r1", "zzzzqqqq####@@@@ unseen trigrams ^^^ everywhere éü世界"),
        ("r2", "x" * 5000),  # crosses max_chars
        ("r3", "ab"),  # shorter than one trigram body
        ("r4", "Mixed CASE Text With  Spaces\nand\nnewlines\tand tabs"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r["lm_bits_per_char"] for r in lm_score(df, model).collect()}
    for doc_id, text in rows:
        exp = score_doc_py(model, text)
        assert abs(got[doc_id] - exp) < 1e-12, (doc_id, got[doc_id], exp)


def test_lm_vectorized_speedup_over_reference():
    """The vectorized scorer's per-doc kernel must beat the per-char
    Python loop by >=5x on a realistic document (driver-side microbench
    of exactly the two code paths, no Spark overhead in either)."""
    import math
    import time

    import numpy as np

    from feature_extractor_spark.functions.lm import _pack_model, score_doc_py

    rnd_text = ("lorem ipsum dolor sit amet consectetur " * 200)[:4000]
    # small synthetic model exercising both hit and miss paths
    model = {
        "tri": {rnd_text[i : i + 3]: -1.0 for i in range(0, 2000)},
        "ctx": {rnd_text[i : i + 2]: -0.5 for i in range(0, 2000)},
        "log_alpha": math.log(0.1),
        "log_unseen_ctx": math.log(0.1 * 40),
    }
    packed = _pack_model(model)
    tri_k, tri_v = packed["tri_k"], packed["tri_v"]
    ctx_k, ctx_v = packed["ctx_k"], packed["ctx_v"]
    la, luc = packed["log_alpha"], packed["log_unseen_ctx"]
    inv_ln2 = 1.0 / math.log(2.0)

    def vec_one(text):
        t = f"\x02\x02{text[:4000].lower()}\x03"
        cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        k2 = (cp[:-2] << 21) | cp[1:-1]
        k3 = (k2 << 21) | cp[2:]
        i3 = np.minimum(np.searchsorted(tri_k, k3), len(tri_k) - 1)
        num = np.where(tri_k[i3] == k3, tri_v[i3], la)
        i2 = np.minimum(np.searchsorted(ctx_k, k2), len(ctx_k) - 1)
        den = np.where(ctx_k[i2] == k2, ctx_v[i2], luc)
        return (float(np.sum(den - num)) / (len(cp) - 2)) * inv_ln2

    assert abs(vec_one(rnd_text) - score_doc_py(model, rnd_text)) < 1e-12

    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        score_doc_py(model, rnd_text)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        vec_one(rnd_text)
    t_vec = time.perf_counter() - t0
    assert t_py / t_vec >= 5.0, f"speedup only {t_py / t_vec:.1f}x"


def test_lm_score_edge_cases(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_char_lm(docs, sample_size=100)
    df = spark.createDataFrame(
        [("a", ""), ("b", None), ("c", "x")], "doc_id string, text string"
    )
    got = {r["doc_id"]: r["lm_bits_per_char"] for r in lm_score(df, model).collect()}
    assert got["a"] is None and got["b"] is None
    assert got["c"] is not None and got["c"] > 0


def test_lm_buckets_ccnet_terciles(spark):
    """Terciles over the score distribution: every doc labeled, bucket
    populations roughly balanced, bucket order matches score order, and
    the head bucket is more in-domain than the tail on a mixed corpus."""
    import random

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_char_lm(docs, sample_size=200)

    rnd = random.Random(11)
    gib = [(f"g{i}", "".join(rnd.choice("qxzj#@%~^|{}") for _ in range(300)))
           for i in range(100)]
    mixed = docs.limit(200).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    ).unionByName(spark.createDataFrame(gib, "doc_id string, text string"))

    from feature_extractor_spark.functions.lm import lm_buckets

    out = lm_buckets(mixed, model).collect()
    assert len(out) == 300
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["lm_bucket"], []).append(r)
    assert set(by_bucket) == {"head", "middle", "tail"}
    # rough balance (terciles of 300 docs)
    for b, rows in by_bucket.items():
        assert 60 <= len(rows) <= 140, (b, len(rows))
    # score order respects bucket order
    mx_head = max(r["lm_bits_per_char"] for r in by_bucket["head"])
    mn_tail = min(r["lm_bits_per_char"] for r in by_bucket["tail"])
    assert mx_head <= mn_tail
    # gibberish concentrates in the tail
    gib_tail = sum(1 for r in by_bucket["tail"] if r["doc_id"].startswith("g"))
    assert gib_tail >= 90


def test_lm_buckets_all_null_scores_raises(spark):
    """ADVICE r5: an all-empty corpus gives percentile_approx -> NULL;
    lm_buckets must raise a meaningful ValueError, not a TypeError."""
    import pytest

    from feature_extractor_spark.functions.lm import lm_buckets

    train = spark.createDataFrame(
        [("t1", "some ordinary training text for the model")],
        "doc_id string, text string",
    )
    model = train_char_lm(train, sample_size=10)
    empty = spark.createDataFrame(
        [("e1", ""), ("e2", None), ("e3", "")], "doc_id string, text string"
    )
    with pytest.raises(ValueError, match="no non-null scores"):
        lm_buckets(empty, model)
