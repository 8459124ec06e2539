"""Deterministic sampling/shuffle: partitioning invariance (the property
df.sample() lacks), stratum rates, hash portability, shuffle-key stability."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.operators.sampling import (
    deterministic_sample,
    deterministic_shuffle,
    hash_uniform,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"s{i % 4}") for i in range(4000)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_sample_is_partitioning_invariant(spark, docs):
    a = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(1), "doc_id", 0.3, seed=5).collect()
    }
    b = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(17), "doc_id", 0.3, seed=5).collect()
    }
    assert a == b and 0.25 < len(a) / 4000 < 0.35


def test_sample_seed_changes_membership(spark, docs):
    a = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3, seed=1).collect()}
    b = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3, seed=2).collect()}
    assert a != b
    assert len(a & b) / len(a | b) < 0.5  # near-independent draws


def test_stratified_rates(spark, docs):
    out = stratified_sample(
        docs, "doc_id", "source", {"s0": 1.0, "s1": 0.5}, default_fraction=0.0
    )
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["s0"] == 1000  # fraction 1.0 keeps everything
    assert 400 < counts.get("s1", 0) < 600
    assert "s2" not in counts and "s3" not in counts


def test_md5_and_xxhash_variants_both_uniform(spark, docs):
    for fn in ("md5", "xxhash64"):
        u = docs.select(hash_uniform("doc_id", 3, fn).alias("u")).toPandas()["u"]
        assert 0.0 <= u.min() and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 0.03


def test_shuffle_key_stable_and_distinct_by_seed(spark, docs):
    k1 = deterministic_shuffle(docs, "doc_id", seed=9).orderBy("doc_id").toPandas()
    k2 = deterministic_shuffle(docs.repartition(7), "doc_id", seed=9).orderBy("doc_id").toPandas()
    np.testing.assert_array_equal(k1["shuffle_key"], k2["shuffle_key"])
    order1 = k1.sort_values("shuffle_key")["doc_id"].tolist()
    assert order1 != sorted(order1)  # actually shuffled


def test_mixture_fractions_math_and_composition(spark):
    """Fractions must make the binding source keep 1.0 and reproduce the
    target mix exactly in expectation; composed with stratified_sample the
    realized token mix lands near the target; unreachable targets raise."""
    import pytest as _pytest

    from feature_extractor_spark.operators.sampling import (
        mixture_fractions,
        stratified_sample,
    )

    rows = []
    for i in range(4000):
        src = "web" if i % 10 < 7 else ("code" if i % 10 < 9 else "books")
        rows.append((f"d{i}", src, 100))  # uniform weight: counts == mass
    docs = spark.createDataFrame(rows, "doc_id string, source string, n_tok int")

    target = {"web": 0.5, "code": 0.3, "books": 0.2}
    fr = mixture_fractions(docs, target, weight_col="n_tok")
    # observed mass: web 2800, code 800, books 400 (x100 tokens)
    # binding source is books: T = min(2800/.5, 800/.3, 400/.2) = 2000
    assert abs(fr["books"] - 1.0) < 1e-12
    T = 400 / 0.2
    assert abs(fr["web"] - (0.5 * T) / 2800) < 1e-12
    assert abs(fr["code"] - (0.3 * T) / 800) < 1e-12

    sampled = stratified_sample(docs, "doc_id", "source", fr, default_fraction=0.0)
    got = {
        r["source"]: r["cnt"]
        for r in sampled.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    total = sum(got.values())
    for s, t in target.items():
        assert abs(got[s] / total - t) < 0.05, (s, got[s] / total)

    # a source absent from target is dropped entirely
    fr2 = mixture_fractions(docs, {"web": 1.0})
    assert fr2["code"] == 0.0 and fr2["books"] == 0.0 and fr2["web"] == 1.0

    with _pytest.raises(ValueError, match="no observed mass"):
        mixture_fractions(docs, {"web": 0.5, "wikipedia": 0.5})


def test_temperature_targets_math_and_composition():
    import math

    import pytest as _pytest

    from feature_extractor_spark.operators.sampling import (
        mixture_fractions,
        temperature_targets,
    )

    obs = {"web": 8000.0, "code": 1000.0, "books": 125.0, "dead": 0.0}

    # alpha=1 reproduces observed proportions; alpha=0 is uniform over
    # positive-mass sources; zero-mass sources get target 0 either way
    t1 = temperature_targets(obs, alpha=1.0)
    tot = 8000 + 1000 + 125
    assert abs(t1["web"] - 8000 / tot) < 1e-12 and t1["dead"] == 0.0
    t0 = temperature_targets(obs, alpha=0.0)
    assert abs(t0["web"] - 1 / 3) < 1e-12
    assert abs(t0["books"] - 1 / 3) < 1e-12

    # smoothing is monotone: alpha<1 raises small-source share, lowers big
    t = temperature_targets(obs, alpha=0.5)
    assert t["books"] > t1["books"] and t["web"] < t1["web"]
    assert abs(sum(t.values()) - 1.0) < 1e-12
    # exact closed form
    z = math.sqrt(8000) + math.sqrt(1000) + math.sqrt(125)
    assert abs(t["code"] - math.sqrt(1000) / z) < 1e-12

    with _pytest.raises(ValueError, match="alpha"):
        temperature_targets(obs, alpha=-0.1)
    with _pytest.raises(ValueError, match="positive mass"):
        temperature_targets({"a": 0.0})

    # composes with mixture_fractions: the binding source keeps 1.0 and
    # every kept fraction is <= 1 (downsample-only)
    fr = mixture_fractions_from_dict(obs, t)
    assert max(fr.values()) == 1.0 and all(0.0 <= f <= 1.0 for f in fr.values())


def mixture_fractions_from_dict(observed, target):
    """Driver-side twin of mixture_fractions' arithmetic for dict input
    (the Spark function aggregates the corpus first)."""
    total_out = min(observed[s] / t for s, t in target.items() if t > 0)
    return {
        s: (min(1.0, (target.get(s, 0.0) * total_out) / c) if target.get(s, 0.0) > 0 else 0.0)
        for s, c in observed.items()
        if c > 0
    }
