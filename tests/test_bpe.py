"""Subword BPE apply-encoder (functions/text.encode_bpe): parity vs a
from-scratch Python BPE oracle on hand-built merges, UNK/byte-fallback
edges, decode round-trip, end-to-end curate -> encode_bpe ->
curate_tokens handoff, and the map-only plan pin."""

import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.functions.text import decode_bpe, encode_bpe

EOW = "</w>"

# hand-built Sennrich-style merge list over the {low, lower, newest,
# widest} family plus an "ab"-chain that exercises rank precedence
MERGES = [
    (0, "e", "s"),
    (1, "es", f"t{EOW}"),
    (2, "l", "o"),
    (3, "lo", "w"),
    (4, "n", "e"),
    (5, "ne", "w"),
    (6, "new", f"est{EOW}"),
    (7, "low", "e"),  # "low"+"e" -> "lowe"
    (8, "lowe", f"r{EOW}"),
    (9, "w", "i"),
    (10, "wi", "d"),
    (11, "a", "b"),
    (12, "ab", "ab"),  # merges of merged symbols: abab
]


def _vocab_rows():
    # every symbol reachable from MERGES over the test corpus, plus byte
    # fallbacks for é and the bare end-of-word token
    syms = [
        f"low{EOW}", "low", f"lower{EOW}", f"newest{EOW}", "wid",
        f"est{EOW}", "e", "s", f"t{EOW}", "i", "d", "w", "o", "l", "n",
        "ab", "abab", f"b{EOW}", f"a{EOW}", "r", "u",
        f"r{EOW}", f"u{EOW}", f"d{EOW}", f"w{EOW}", "lowe", "ne", "new",
        "es", "lo", "wi", "a", "b",
        "<0xC3>", "<0xA9>", EOW,
    ]
    return [(s, i + 2) for i, s in enumerate(dict.fromkeys(syms))]


@pytest.fixture(scope="module")
def merges(spark):
    return spark.createDataFrame(MERGES, "rank int, left string, right string")


@pytest.fixture(scope="module")
def vocab(spark):
    return spark.createDataFrame(_vocab_rows(), "token string, id int")


def _py_bpe(word, ranks):
    """From-scratch oracle: independent of the operator's code path."""
    syms = list(word)
    syms[-1] += EOW
    while len(syms) > 1:
        pairs = [(ranks[(a, b)], i)
                 for i, (a, b) in enumerate(zip(syms, syms[1:]))
                 if (a, b) in ranks]
        if not pairs:
            break
        best = min(r for r, _ in pairs)
        a, b = None, None
        for (l, r_) in zip(syms, syms[1:]):
            if ranks.get((l, r_)) == best:
                a, b = l, r_
                break
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


def test_encode_bpe_matches_python_oracle(spark, merges, vocab):
    ranks = {(l, r): k for k, l, r in MERGES}
    vmap = dict(_vocab_rows())
    texts = [
        "low lower newest", "widest low", "abab ab a b",
        "newest newest lower", "ababab",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["tokens"]
        for r in encode_bpe(docs, merges, vocab).collect()
    }
    for i, t in enumerate(texts):
        exp = [vmap[s] for w in t.split() for s in _py_bpe(w, ranks)]
        assert got[i] == exp, (t, got[i], exp)


def test_encode_bpe_byte_fallback_and_unk(spark, merges, vocab):
    docs = spark.createDataFrame(
        [(1, "café low"), (2, "日 low")], "doc_id long, text string"
    )
    vmap = dict(_vocab_rows())
    got = {r["doc_id"]: r for r in
           encode_bpe(docs, merges, vocab, n_tok_col="n_tok").collect()}
    # "café": c and f have no vocab/byte entries -> UNK each; "a" is in
    # vocab; word-final é -> byte tokens (<0xC3>,<0xA9>) + </w> marker;
    # "low" ends ["lo","w</w>"] under these merges
    toks1 = got[1]["tokens"]
    assert toks1 == [
        1, vmap["a"], 1, vmap["<0xC3>"], vmap["<0xA9>"], vmap[EOW],
        vmap["lo"], vmap[f"w{EOW}"],
    ]
    assert got[1]["n_tok"] == len(toks1)
    # 日 has no byte tokens in vocab -> single UNK for the symbol
    toks2 = got[2]["tokens"]
    assert toks2 == [1, vmap["lo"], vmap[f"w{EOW}"]]
    # NULL text -> NULL
    nulls = encode_bpe(
        spark.createDataFrame([(9, None)], "doc_id long, text string"),
        merges, vocab,
    ).collect()[0]
    assert nulls["tokens"] is None and nulls["n_tok"] is None


def test_encode_bpe_decode_roundtrip(spark, merges, vocab):
    texts = ["low lower newest widest", "abab ab newest", "café low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    enc = encode_bpe(docs, merges, vocab)
    dec = {r["doc_id"]: r["rt"]
           for r in decode_bpe(enc, vocab, out_col="rt").collect()}
    assert dec[0] == "low lower newest widest"
    assert dec[1] == "abab ab newest"
    # byte-fallback é survives the round trip; unknown c/a/f become <unk>
    assert dec[2].endswith("é low") and "<unk>" in dec[2]


def test_encode_bpe_is_map_only(spark, merges, vocab):
    """Plan pin: the encoder is one MapInPandas with no JOIN shuffle
    (merges+vocab are broadcast dicts, never joined). A NARROW input
    (fewer splits than the cluster) gets exactly one round-robin widen
    ahead of the Python pass (r10 — a compact corpus otherwise
    serializes the merge loop through a handful of tasks); an input
    already at cluster width gets NO added exchange."""
    par = spark.sparkContext.defaultParallelism
    docs = spark.createDataFrame(
        [(1, "low")], "doc_id long, text string"
    ).coalesce(1)
    enc = encode_bpe(docs, merges, vocab)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "REPARTITION_BY_NUM" in plan, plan
    assert "MapInPandas" in plan
    # already-wide input: the widen must NOT fire (scale contract — a
    # well-partitioned corpus is untouched)
    wide = spark.createDataFrame(
        [(i, "low") for i in range(par)], "doc_id long, text string"
    ).repartition(par)
    enc_w = encode_bpe(wide, merges, vocab)
    plan_w = enc_w._jdf.queryExecution().executedPlan().toString()
    assert plan_w.count("Exchange") == 1, plan_w  # only the caller's own
    assert "MapInPandas" in plan_w


def test_curate_encode_bpe_curate_tokens_handoff(spark, merges, vocab):
    """End-to-end: text curation -> BPE encoding -> tokens curation;
    the BPE stream satisfies the input-hint payload shape and packs."""
    from feature_extractor_spark.plans.tokens_pipeline import (
        curate,
        curate_tokens,
    )

    base = ["low lower newest", "widest low ab", "abab newest lower low",
            "ab ab low newest widest lower"]
    docs = spark.createDataFrame(
        [(f"d{i}", base[i % 4] + f" tail{i}", "web") for i in range(40)],
        "doc_id string, text string, source string",
    )
    curated = curate(docs, near_dup_threshold=0.95, packing="contiguous")
    enc = encode_bpe(
        curated.select("doc_id", "text", "source"), merges, vocab
    ).withColumn(
        "ts",
        F.timestamp_seconds(
            F.pmod(F.xxhash64("doc_id"), F.lit(100000))
        ).cast("timestamp_ntz"),
    )
    out = curate_tokens(
        enc.drop("text"), context_len=64, min_tok=2,
        near_dup_threshold=0.99, packing="ffd", pack_n_shards=4,
    )
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["bin_fill"] <= 64 or r["oversize"] for r in rows)
    # every id the encoder emitted is a real subword id (no UNK: tails
    # are... tails contain digits with no vocab entries, so UNKs exist —
    # just check the arrays are non-empty ints)
    assert all(len(r["tokens"]) == r["n_tok"] for r in rows)


# ---------------------------------------------------------------- learn_bpe

def _naive_learn(word_freqs, num_merges, min_pair_count=2):
    """From-scratch Sennrich trainer oracle: recounts EVERY pair each
    iteration (no incremental updates — an independent code path from
    learn_bpe's). Tie-break: count desc, then lexicographically
    smallest (left, right)."""
    words = {}
    for w, f in word_freqs.items():
        s = list(w)
        s[-1] += EOW
        words[tuple(s)] = words.get(tuple(s), 0) + f
    merges = []
    for _ in range(num_merges):
        stats = {}
        for s, f in words.items():
            for p in zip(s, s[1:]):
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if stats[best] < min_pair_count:
            break
        merges.append(best)
        l, r_ = best
        new_words = {}
        for s, f in words.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r_:
                    out.append(l + r_)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + f
        words = new_words
    return merges


CORPUS = [
    "low low low lower lower newest newest newest newest widest",
    "the newest gadget is the widest yet and the lowest too",
    "new news newer knew lowly slowly slow slower wide wider",
    "banana bandana cabana abracadabra",
]


def test_learn_bpe_matches_naive_trainer(spark):
    """The distributed word-count + incremental driver loop must learn
    EXACTLY the merge sequence the naive recount-everything oracle
    learns."""
    from collections import Counter

    from feature_extractor_spark.functions.text import learn_bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )
    merges_df, vocab_df = learn_bpe(docs, num_merges=40, min_pair_count=2)
    got = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("rank").collect()
    ]
    wf = Counter(w for t in CORPUS for w in t.split())
    want = _naive_learn(dict(wf), 40, min_pair_count=2)
    assert got == want and len(got) > 10
    # vocab covers every merge product and the full alphabet, ids unique
    toks = {r["token"]: r["id"] for r in vocab_df.collect()}
    assert len(set(toks.values())) == len(toks)
    assert min(toks.values()) == 2  # 0/1 reserved for PAD/UNK
    for l, r_ in got:
        assert (l + r_) in toks
    for ch in "lowestnwid":
        assert ch in toks or f"{ch}{EOW}" in toks


def test_learn_bpe_roundtrips_through_encoder(spark):
    """learned merges+vocab -> encode_bpe -> decode_bpe reproduces the
    training text (whitespace-normalized), including an UNSEEN word via
    partial merges and an unseen CHARACTER via byte fallback."""
    from feature_extractor_spark.functions.text import learn_bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )
    merges_df, vocab_df = learn_bpe(docs, num_merges=60, min_pair_count=2)
    probe = [
        (0, CORPUS[0]),
        (1, CORPUS[3]),
        (2, "unseen lowlands widening"),  # unseen words, seen alphabet
        (3, "café latte"),  # é -> byte fallback
    ]
    pdf = spark.createDataFrame(probe, "doc_id int, text string")
    enc = encode_bpe(pdf, merges_df, vocab_df)
    dec = decode_bpe(enc.drop("text"), vocab_df)
    got = {r["doc_id"]: r["text"] for r in dec.collect()}
    import re

    for i, t in probe:
        assert got[i] == re.sub(r"\s+", " ", t).strip()


def test_learn_bpe_tiebreak_and_stop(spark):
    """Equal-count pairs pick the lexicographically smallest; learning
    stops when the best count drops below min_pair_count."""
    from feature_extractor_spark.functions.text import learn_bpe

    # "zb" and "ac" both occur exactly 3 times -> (a,c) merges first
    docs = spark.createDataFrame(
        [(0, "zbx ach"), (1, "zby acj"), (2, "zbq ack")],
        "doc_id int, text string",
    )
    merges_df, _ = learn_bpe(docs, num_merges=2, min_pair_count=3)
    got = [(r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()]
    assert got[0] == ("a", "c")
    assert got[1] == ("z", "b")
    # min_pair_count binds: nothing else reaches 3 occurrences
    assert len(got) == 2


def test_learn_bpe_distinct_word_bound_raises(spark):
    from feature_extractor_spark.functions.text import learn_bpe

    docs = spark.createDataFrame(
        [(0, "one two three four five six")], "doc_id int, text string"
    )
    with pytest.raises(ValueError, match="max_distinct_words"):
        learn_bpe(docs, max_distinct_words=3)
    # min_count thins the table below the bound
    m, v = learn_bpe(docs, max_distinct_words=3, min_count=2, num_merges=5)
    assert m.count() == 0  # no repeated words -> nothing to merge


def test_tokenizer_save_load_roundtrip(spark, tmp_path):
    """learn -> save -> load in a 'new consumer' -> encode must equal
    encoding with the in-memory tables; a missing artifact raises by
    name."""
    from feature_extractor_spark.functions.text import (
        learn_bpe,
        load_tokenizer,
        save_tokenizer,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )
    merges, vocab = learn_bpe(docs, num_merges=30, min_pair_count=2)
    tok_dir = str(tmp_path / "tok")
    save_tokenizer(merges, vocab, tok_dir)
    m2, v2 = load_tokenizer(spark, tok_dir)
    probe = spark.createDataFrame(
        [(0, CORPUS[1]), (1, "fresh unseen widest text")],
        "doc_id int, text string",
    )
    direct = {
        r["doc_id"]: r["tokens"]
        for r in encode_bpe(probe, merges, vocab).collect()
    }
    loaded = {
        r["doc_id"]: r["tokens"] for r in encode_bpe(probe, m2, v2).collect()
    }
    assert direct == loaded

    with pytest.raises(FileNotFoundError, match="missing tables"):
        load_tokenizer(spark, str(tmp_path / "nope"))


def test_word_freq_plan_is_partial_aggregated(spark):
    """Plan pin: learn_bpe's corpus-bearing word count must plan as
    partial (map-side) + final HashAggregate around ONE exchange on the
    word key — the shape that bounds the shuffle at |distinct words|
    rows per map partition instead of |corpus words|."""
    from feature_extractor_spark.functions.text import _word_freqs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )
    plan = (
        _word_freqs(docs, "text", False, 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "partial_count" in plan, plan


def test_learn_bpe_on_driver_documents_roundtrip(spark, sf_small):
    """Integration on the driver's real parquet: learn a tokenizer from
    the documents table and round-trip a sample of the SAME corpus
    through encode/decode (whitespace-normalized)."""
    import re

    from feature_extractor_spark.functions.text import learn_bpe

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    merges, vocab = learn_bpe(docs, num_merges=150, min_count=2)
    assert merges.count() > 50
    sample = docs.limit(8).select("doc_id", "text")
    enc = encode_bpe(sample, merges, vocab)
    dec = {
        r["doc_id"]: r["rt"]
        for r in decode_bpe(enc, vocab, out_col="rt").collect()
    }
    for r in sample.collect():
        want = re.sub(r"[ \t\n\x0b\f\r]+", " ", r["text"]).strip()
        assert dec[r["doc_id"]] == want


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcx", min_size=1, max_size=5)
_corpus = st.lists(
    st.lists(_word, min_size=1, max_size=8).map(" ".join),
    min_size=1, max_size=10,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus, n=st.integers(min_value=1, max_value=12))
def test_learn_bpe_property_matches_naive(spark, texts, n):
    """Property: on ANY small corpus (tiny alphabet maximizes pair
    collisions, overlap runs like 'aaaa', and tie-breaks), the
    distributed trainer's merge sequence equals the naive
    recount-everything oracle's."""
    from collections import Counter

    from feature_extractor_spark.functions.text import learn_bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    merges_df, _ = learn_bpe(docs, num_merges=n, min_pair_count=2)
    got = [(r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()]
    wf = Counter(w for t in texts for w in t.split())
    assert got == _naive_learn(dict(wf), n, min_pair_count=2)
