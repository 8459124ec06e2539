"""build_word_vocab / encode_words / decode_words — the text->tokens
bridge (r7): frequency-ranked word vocabulary + deterministic map-only
encoding whose output satisfies the input-hint tokens payload shape, so
curate() output feeds curate_tokens()/pack_sequences directly."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.functions.text import (
    build_word_vocab,
    decode_words,
    encode_words,
)

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_vocab_matches_python_counter_on_real_docs(spark):
    docs = spark.read.parquet(SF_DOCS)
    got = [
        (r["token"], r["id"], r["n_total"])
        for r in build_word_vocab(docs, vocab_size=50, min_count=2)
        .orderBy("id")
        .collect()
    ]
    c = Counter()
    for r in docs.select("text").collect():
        c.update(w for w in r["text"].lower().split() if w)
    exp = sorted(
        ((t, n) for t, n in c.items() if n >= 2), key=lambda x: (-x[1], x[0])
    )[:48]
    assert got == [(t, i + 2, n) for i, (t, n) in enumerate(exp)]
    # ids 0/1 reserved, assignment deterministic and dense from 2
    assert [g[1] for g in got] == list(range(2, 2 + len(got)))


def test_encode_decode_roundtrip_and_unk(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "THE Dog SAT"),  # lowercase folding
            (3, None),
            (4, "zebra unseen the"),
            (5, "   "),  # whitespace-only -> empty array
        ],
        "doc_id long, text string",
    )
    # vocabulary fit on docs 1-2 only, so doc 4's zebra/unseen are OOV
    vocab = build_word_vocab(docs.filter(F.col("doc_id") <= 2), vocab_size=16)
    enc = encode_words(docs, vocab)
    rows = {r["doc_id"]: r for r in enc.collect()}
    assert rows[3]["tokens"] is None and rows[3]["n_tok"] is None
    assert rows[5]["tokens"] == [] and rows[5]["n_tok"] == 0
    assert rows[4]["tokens"][0] == 1 and rows[4]["tokens"][1] == 1  # UNK
    for d in (1, 2, 4):
        assert rows[d]["n_tok"] == len(rows[d]["tokens"])
        assert all(t >= 1 for t in rows[d]["tokens"])  # 0 (PAD) never emitted
    # decode round-trips in-vocab text (lowercased, single-spaced)
    dec = {
        r["doc_id"]: r["text2"]
        for r in decode_words(enc, vocab, out_col="text2").collect()
    }
    assert dec[1] == "the cat sat on the mat"
    assert dec[2] == "the dog sat"
    assert dec[4] == "<unk> <unk> the"


def test_encode_is_map_only_and_vocab_bounded(spark):
    docs = spark.read.parquet(SF_DOCS)
    vocab = build_word_vocab(docs, vocab_size=64)
    assert vocab.count() <= 62  # vocab_size - n_reserved bound
    plan = (
        encode_words(docs, vocab)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan  # pure map: no shuffle at any scale


def test_text_to_tokens_pipeline_handoff(spark):
    """curate() -> encode_words -> curate_tokens: the encoded frame
    satisfies the input-hint payload (doc_id, tokens:array<int>, n_tok,
    source, ts) and the tokens pipeline runs end-to-end on it."""
    from feature_extractor_spark.plans.tokens_pipeline import (
        curate,
        curate_tokens,
    )

    docs = spark.read.parquet(SF_DOCS).limit(200)
    curated = curate(
        docs, context_len=512, min_quality=0.0, max_dup_line_frac=1.0,
        max_top_2gram_frac=1.0,
    ).select("doc_id", "text", "source")
    vocab = build_word_vocab(curated, vocab_size=4096)
    toks = encode_words(curated, vocab).withColumn(
        "ts", F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id"))
    )
    out = curate_tokens(
        toks.select("doc_id", "tokens", "n_tok", "source", "ts"),
        context_len=256, min_tok=2,
    )
    rows = out.collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r["n_tok"] == len(r["tokens"])
        assert all(isinstance(t, int) for t in r["tokens"][:5])


def test_vocab_size_guard(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        build_word_vocab(docs, vocab_size=2, n_reserved=2)


def test_unicode_whitespace_vocab_encode_parity(spark):
    """ADVICE r8: Java \\s is ASCII-only, so the JVM-side vocab split and
    the Python-side encode split must agree that Unicode whitespace
    (NBSP, U+2028, ideographic space) does NOT separate words. A word
    glued by NBSP counts as ONE vocab token and encode_words must map it
    back to that same token — zero UNKs on in-vocab text, round-trip
    exact modulo ASCII-whitespace normalization."""
    from feature_extractor_spark.functions.text import (
        build_word_vocab,
        decode_words,
        encode_words,
    )

    nbsp, ls, ideo = " ", " ", "　"
    docs = spark.createDataFrame(
        [
            (1, f"alpha{nbsp}beta gamma alpha{nbsp}beta"),
            (2, f"gamma delta{ls}eps gamma\tdelta{ls}eps"),
            (3, f"zz{ideo}top gamma zz{ideo}top"),
        ],
        "doc_id long, text string",
    )
    vocab = build_word_vocab(docs, vocab_size=64, n_reserved=2)
    toks = {r["token"] for r in vocab.collect()}
    # glued forms are single vocab entries; their fragments are NOT
    assert f"alpha{nbsp}beta" in toks and f"delta{ls}eps" in toks
    assert "alpha" not in toks and "beta" not in toks and "eps" not in toks
    enc = encode_words(docs, vocab, n_tok_col="n_tok")
    got = {r["doc_id"]: r for r in enc.collect()}
    # every word is in-vocab -> no UNK (id 1) anywhere
    assert all(1 not in r["tokens"] for r in got.values())
    assert got[1]["n_tok"] == 3 and got[2]["n_tok"] == 4 and got[3]["n_tok"] == 3
    dec = {
        r["doc_id"]: r["text_rt"]
        for r in decode_words(enc, vocab, out_col="text_rt").collect()
    }
    assert dec[1] == f"alpha{nbsp}beta gamma alpha{nbsp}beta"
    assert dec[3] == f"zz{ideo}top gamma zz{ideo}top"
