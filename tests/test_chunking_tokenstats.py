"""chunk_tokens (operators/packing.py), token_freq_topk / vocab_coverage /
normalize_unicode (functions/text.py): Python oracles over hand-built and
synthetic inputs, plus plan shape (chunking must stay a narrow map)."""

import unicodedata
from collections import Counter

import pytest
from pyspark.sql import functions as F

from feature_extractor_spark.functions.text import (
    normalize_unicode,
    token_freq_topk,
    vocab_coverage,
)
from feature_extractor_spark.operators.packing import chunk_tokens
from feature_extractor_spark.sources.tokens import synth_tokens


def _py_chunks(tokens, max_len, overlap, min_tail):
    if not tokens:
        return []
    step = max_len - overlap
    out = []
    for cid, start in enumerate(range(0, len(tokens), step)):
        chunk = tokens[start : start + max_len]
        # non-first chunks must meet min_tail AND contribute at least one
        # NEW token (len > overlap) — a chunk fully covered by its
        # predecessor duplicates training data (ADVICE r6)
        if cid > 0 and (len(chunk) < min_tail or len(chunk) <= overlap):
            continue
        out.append((cid, start, chunk, len(chunk)))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("empty", []),
        ("null", None),
        ("short", [1, 2, 3]),
        ("exact", list(range(8))),
        ("long", list(range(100, 127))),
        ("tail1", list(range(9))),
    ]
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_chunk_tokens_matches_python_oracle(spark, docs):
    got = (
        chunk_tokens(docs, max_len=8, overlap=2, min_tail=3)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    pdf = {r["doc_id"]: r["tokens"] for r in docs.collect()}
    exp = []
    for did in sorted(pdf):
        for cid, start, chunk, n in _py_chunks(pdf[did] or [], 8, 2, 3):
            exp.append((did, cid, start, chunk, n))
    assert [
        (r["doc_id"], r["chunk_id"], r["chunk_start"], r["chunk_tokens"], r["chunk_n_tok"])
        for r in got
    ] == exp


def test_chunk_tokens_overlap_and_coverage(spark, docs):
    # every input token position is covered by >=1 chunk; consecutive
    # chunks of the same doc share exactly `overlap` tokens (interior)
    out = chunk_tokens(docs, max_len=8, overlap=2, min_tail=1)
    rows = out.where(F.col("doc_id") == "long").orderBy("chunk_id").collect()
    toks = list(range(100, 127))
    seen = []
    for r in rows:
        assert r["chunk_tokens"] == toks[r["chunk_start"] : r["chunk_start"] + 8]
        seen.extend(r["chunk_tokens"])
    assert set(seen) == set(toks)
    for a, b in zip(rows, rows[1:]):
        if b["chunk_n_tok"] >= 2:
            assert a["chunk_tokens"][-2:] == b["chunk_tokens"][:2]


def test_chunk_tokens_no_overlap_roundtrip(spark):
    # (doc_id, ts) is the unique row key — doc_id repeats across sequences
    tok = synth_tokens(spark, n_rows=500, n_docs=20).select(
        "doc_id", "ts", "tokens"
    )
    out = chunk_tokens(tok, max_len=16, overlap=0, min_tail=1)
    rebuilt = (
        out.groupBy("doc_id", "ts")
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk_tokens"))
                ).getField("chunk_tokens")
            ).alias("rebuilt")
        )
    )
    diff = (
        tok.join(rebuilt, ["doc_id", "ts"])
        .where(F.col("tokens") != F.col("rebuilt"))
        .count()
    )
    assert diff == 0


def test_chunk_tokens_rejects_bad_overlap(spark, docs):
    with pytest.raises(ValueError):
        chunk_tokens(docs, max_len=8, overlap=8)


def test_chunk_tokens_plan_is_narrow(spark, docs):
    plan = (
        chunk_tokens(docs, max_len=8, overlap=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure map: chunking must never shuffle


def test_token_freq_topk_matches_counter(spark):
    tok = synth_tokens(spark, n_rows=800, n_docs=25).select("tokens")
    rows = [r["tokens"] for r in tok.collect()]
    total = Counter()
    ndocs = Counter()
    for ts in rows:
        total.update(ts)
        ndocs.update(set(ts))
    exp = sorted(
        ((t, ndocs[t], c) for t, c in total.items()),
        key=lambda x: (-x[2], x[0]),
    )[:50]
    got = [
        (r["token"], r["n_docs"], r["n_total"])
        for r in token_freq_topk(tok, "tokens", k=50).collect()
    ]
    assert got == exp


def test_vocab_coverage_exact(spark):
    rows = [
        ("a", [0, 1, 2, 2, 5]),
        ("b", [1, 7, -1, 9]),  # 9 and -1 out of range for vocab_size=9
        ("c", []),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = vocab_coverage(df, "tokens", vocab_size=9).collect()[0]
    assert got["n_docs"] == 4
    assert got["n_total"] == 9
    assert got["n_distinct"] == 7  # {0,1,2,5,7,9,-1}
    assert got["n_distinct_in_vocab"] == 5  # {0,1,2,5,7}
    assert got["coverage"] == 5 / 9.0
    assert got["n_oov"] == 2
    assert got["oov_frac"] == 2 / 9.0


def test_normalize_unicode_nfc_and_strips(spark):
    decomposed = "cafe\u0301"  # e + combining acute
    rows = [
        ("d", decomposed),
        ("ctl", "a\x00b\x1fc\tkeep\nlines"),
        ("zw", "zero\u200bwidth\ufeffgone"),
        ("ok", "plain"),
        ("nul", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in normalize_unicode(df, "text").collect()
    }
    assert got["d"] == unicodedata.normalize("NFC", decomposed) == "caf\u00e9"
    assert got["ctl"] == "abc\tkeep\nlines"
    assert got["zw"] == "zerowidthgone"
    assert got["ok"] == "plain"
    assert got["nul"] is None


def test_append_eos(spark):
    from feature_extractor_spark.operators.packing import append_eos

    rows = [("a", [1, 2, 3], 3), ("b", [], 0), ("n", None, None)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int")
    got = {r["doc_id"]: r for r in append_eos(df, eos_id=50256).collect()}
    assert got["a"]["tokens"] == [1, 2, 3, 50256] and got["a"]["n_tok"] == 4
    assert got["b"]["tokens"] == [50256] and got["b"]["n_tok"] == 1
    assert got["n"]["tokens"] is None and got["n"]["n_tok"] is None


def test_curate_tokens_eos_option(spark):
    from feature_extractor_spark.plans.tokens_pipeline import curate_tokens
    from feature_extractor_spark.sources.tokens import synth_tokens

    df = synth_tokens(spark, n_rows=200, n_docs=20)
    out = curate_tokens(df, context_len=256, eos_id=50256).collect()
    assert len(out) > 0
    for r in out:
        assert r["tokens"][-1] == 50256
        assert r["n_tok"] == len(r["tokens"])
    # packing contiguity still holds with the extra slot counted
    pdf = sorted(out, key=lambda r: (r["shuffle_key"], r["seq_id"]))
    for a, b in zip(pdf, pdf[1:]):
        assert b["tok_start"] == a["tok_start"] + a["n_tok"]


def test_sample_n_per_group_exact_and_stable(spark):
    from feature_extractor_spark.operators.sampling import sample_n_per_group
    from feature_extractor_spark.sources.tokens import synth_tokens

    df = synth_tokens(spark, n_rows=600, n_docs=6).select("doc_id", "ts")
    df = df.withColumn("rid", F.concat("doc_id", F.lit("#"), F.col("ts").cast("string")))
    out = sample_n_per_group(df, "rid", "doc_id", n=7, seed=3)
    sizes = {r["doc_id"]: r["n"] for r in
             out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    full = {r["doc_id"]: r["n"] for r in
            df.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    for d, n_full in full.items():
        assert sizes.get(d, 0) == min(7, n_full)
    # partitioning-independent: same membership after a repartition
    a = sorted(r["rid"] for r in out.collect())
    b = sorted(
        r["rid"]
        for r in sample_n_per_group(
            df.repartition(13), "rid", "doc_id", n=7, seed=3
        ).collect()
    )
    assert a == b
    # different seed -> (almost surely) different membership
    c = sorted(
        r["rid"]
        for r in sample_n_per_group(df, "rid", "doc_id", n=7, seed=4).collect()
    )
    assert a != c


def test_normalize_unicode_collapse_and_out_col(spark):
    df = spark.createDataFrame(
        [("a", "two   spaces\n\nand  tabs\t!")], "doc_id string, text string"
    )
    out = normalize_unicode(
        df, "text", out_col="key", collapse_whitespace=True
    ).collect()[0]
    assert out["text"] == "two   spaces\n\nand  tabs\t!"  # original kept
    assert out["key"] == "two spaces and tabs !"
    with pytest.raises(ValueError):
        normalize_unicode(df, "text", form="NFX")


# --- property test: chunk_tokens vs the plain-Python chunker -------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_chunk_cases = st.tuples(
    st.lists(  # up to 6 docs of up to 40 tokens
        st.lists(st.integers(min_value=0, max_value=999), max_size=40),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=12),  # max_len
    st.integers(min_value=0, max_value=11),  # overlap (clamped < max_len)
    st.integers(min_value=1, max_value=6),  # min_tail
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_chunk_cases)
def test_chunk_tokens_property_matches_python(spark, case):
    docs_tokens, max_len, overlap, min_tail = case
    overlap = min(overlap, max_len - 1)
    rows = [(f"d{i}", ts) for i, ts in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = [
        (r["doc_id"], r["chunk_id"], r["chunk_start"], r["chunk_tokens"])
        for r in chunk_tokens(
            df, max_len=max_len, overlap=overlap, min_tail=min_tail
        )
        .orderBy("doc_id", "chunk_id")
        .collect()
    ]
    exp = []
    for i, ts in enumerate(rows):
        for cid, start, chunk, _n in _py_chunks(
            ts[1], max_len, overlap, min_tail
        ):
            exp.append((f"d{i}", cid, start, chunk))
    assert got == exp


def test_sample_n_per_group_two_phase_equals_single_phase_on_skew(spark):
    """VERDICT r6 item 3: the two-phase exact top-n (map-side per-batch
    reduction, then the rank window on the reduced frame) must select the
    IDENTICAL membership as the single-window form on a heavily skewed
    group layout, and its executed plan must show the partial reduction
    (MapInPandas) feeding exactly ONE group-keyed exchange."""
    from feature_extractor_spark.operators.sampling import sample_n_per_group
    from feature_extractor_spark.sources.tokens import synth_tokens

    # heavy_share=2 -> half of all rows land on doc_000000 (the exact
    # single-task-sort hazard the two-phase form removes)
    df = synth_tokens(spark, n_rows=2000, n_docs=8, heavy_share=2).select(
        "doc_id", "ts"
    )
    df = df.withColumn(
        "rid", F.concat("doc_id", F.lit("#"), F.col("ts").cast("string"))
    )
    two = sample_n_per_group(df, "rid", "doc_id", n=9, seed=5)
    one = sample_n_per_group(df, "rid", "doc_id", n=9, seed=5, two_phase=False)
    assert sorted(r["rid"] for r in two.collect()) == sorted(
        r["rid"] for r in one.collect()
    )
    # schema untouched (helper columns dropped)
    assert two.columns == df.columns

    # plan pin on a FRESH (pre-action) frame: after an action the AQE
    # plan string carries both Initial and Final sections and would
    # double-count the single exchange
    fresh = sample_n_per_group(df, "rid", "doc_id", n=9, seed=5)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # the reduction sits BELOW the exchange (printed after it, since the
    # physical plan prints root-first): partial top-n before the shuffle
    assert plan.index("MapInPandas") > plan.index("Exchange hashpartitioning")


def test_sample_n_per_group_two_phase_keeps_null_group(spark):
    """ADVICE r8: pandas groupby drops NULL-key groups by default, so the
    phase-1 partial top-n silently lost every NULL-group row while the
    single-phase window kept them — membership must be identical,
    including the NULL group."""
    from feature_extractor_spark.operators.sampling import sample_n_per_group

    rows = [(f"r{i:03d}", None if i % 3 == 0 else f"g{i % 2}") for i in range(60)]
    df = spark.createDataFrame(rows, "rid string, doc_id string").repartition(5)
    two = {
        (r["rid"], r["doc_id"])
        for r in sample_n_per_group(df, "rid", "doc_id", n=4, seed=7).collect()
    }
    one = {
        (r["rid"], r["doc_id"])
        for r in sample_n_per_group(
            df, "rid", "doc_id", n=4, seed=7, two_phase=False
        ).collect()
    }
    assert two == one
    assert sum(1 for _, g in two if g is None) == 4  # NULL group sampled too
