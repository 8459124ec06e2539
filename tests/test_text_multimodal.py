"""Text-analysis functions + multimodal plumbing."""

import numpy as np
import pytest

from feature_extractor_spark.functions.text import (
    fingerprint,
    language_id,
    quality_score,
    token_counts,
)
from feature_extractor_spark.operators.multimodal import decode_features, synth_media


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello world, this is fine!"), (2, ""), (3, "  a  b  ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in token_counts(df).collect()}
    assert out[1]["n_words"] == 5
    # BPE-ish: hello/world/,/this/is/fine/! -> 7
    assert out[1]["n_bpe_tokens"] == 7
    assert out[2]["n_words"] == 0
    assert out[3]["n_words"] == 2


def test_quality_score_bounds_and_stopwords(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is fine"),
            (2, "!!! ??? ;;; ***"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality_score(df).collect()}
    assert out[1]["stopword_ratio"] > 0
    assert out[2]["punct_ratio"] > 0.5
    for r in out.values():
        assert 0.0 <= r["quality"] <= 1.0
    assert out[1]["quality"] > out[2]["quality"]


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the house of the king is in the north and it is that for with as"),
            (2, "el rey de la casa que en un por con para"),
            (3, "der mann und die frau das ist von mit ein"),
            (4, "zzzz qqqq xxxx"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "de"
    assert out[4] == "und"


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different text")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in fingerprint(df).collect()}
    assert out[1]["fp_md5"] == out[2]["fp_md5"]
    assert out[1]["fp_rolling"] == out[2]["fp_rolling"]
    assert out[1]["fp_md5"] != out[3]["fp_md5"]
    # independent oracle for the rolling hash
    def roll(s):
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % 2147483647
        return acc
    assert out[2]["fp_rolling"] == roll("hello world")


def test_multimodal_decode_stub_raises(spark):
    media = synth_media(spark, 8)
    with pytest.raises(Exception) as exc:
        decode_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "media decode" in str(exc.value)


def test_multimodal_fake_decode_deterministic(spark):
    media = synth_media(spark, 32)
    a = decode_features(media.repartition(1), feature_dim=8, fake=True)
    b = decode_features(media.repartition(8), feature_dim=8, fake=True)
    pa = a.orderBy("media_id").toPandas()
    pb = b.orderBy("media_id").toPandas()
    assert pa["features"].map(len).eq(8).all()
    for x, y in zip(pa["features"], pb["features"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    # features bounded [0, 1)
    allv = np.concatenate([np.asarray(v) for v in pa["features"]])
    assert ((allv >= 0) & (allv < 1)).all()
