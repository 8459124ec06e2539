"""Incremental semantic dedup against the persisted ANN index
(streaming/incremental_semantic.py): near-copies of indexed vectors are
flagged via PQ-reconstructed cosine, accepted vectors become searchable
for the NEXT batch, replays are idempotent, and the Structured Streaming
wiring works end to end."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id string, embedding array<double>")


def _base_rows(n_per=30, n_clusters=4, dim=16, seed=5, prefix="v", offset=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 5.0
    rows = []
    for c in range(n_clusters):
        jit = rng.randn(n_per, dim) * 0.15
        for i in range(n_per):
            rows.append(
                (f"{prefix}{offset + c * n_per + i:05d}",
                 [float(x) for x in centers[c] + jit[i]])
            )
    return rows, centers


PARAMS = dict(n_lists=4, m=8, k_codes=32, sample_size=4096, seed=23)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from feature_extractor_spark.operators.ann_index import build_ann_index

    rows, centers = _base_rows()
    corpus = _vecs(spark, rows).persist()
    idx = str(tmp_path_factory.mktemp("semidx")) + "/idx"
    build_ann_index(corpus, idx, residual=True, **PARAMS)
    return corpus, centers, idx


def test_flag_against_ann_index_near_copy_and_novel(spark, built):
    from feature_extractor_spark.streaming.incremental_semantic import (
        flag_against_ann_index,
    )

    corpus, centers, idx = built
    base = corpus.limit(1).collect()[0]
    near = [float(x) + 0.01 for x in base["embedding"]]
    novel = [float(x) for x in -np.asarray(centers[0]) * 3.0 + 40.0]
    new = _vecs(spark, [("n_near", near), ("n_far", novel)])
    flags = {r["vec_id"]: r for r in
             flag_against_ann_index(new, idx, threshold=0.95).collect()}
    assert flags["n_near"]["is_dup"] and flags["n_near"]["cosine"] > 0.95
    assert flags["n_near"]["dup_of"] is not None
    assert not flags["n_far"]["is_dup"] and flags["n_far"]["dup_of"] is None


def test_semantic_ingest_within_and_across_batches(spark, built, tmp_path):
    from feature_extractor_spark.streaming.incremental_semantic import (
        ann_semantic_ingest_batch,
    )

    corpus, centers, idx0 = built
    # fresh index copy so this test owns its mutations
    import shutil

    idx = str(tmp_path / "idx")
    shutil.copytree(idx0, idx)
    acc = str(tmp_path / "acc")

    rng = np.random.RandomState(99)
    fresh_center = rng.randn(16) * 6.0 + 30.0
    a = [float(x) for x in fresh_center]
    a_twin = [float(x) + 0.01 for x in fresh_center]
    indexed = corpus.limit(1).collect()[0]["embedding"]
    dup_of_corpus = [float(x) + 0.005 for x in indexed]

    # batch 0: a + its twin (within-batch dup) + a near-copy of an
    # already-indexed vector (cross-index dup)
    ann_semantic_ingest_batch(
        _vecs(spark, [("a1", a), ("a2", a_twin), ("d1", dup_of_corpus)]),
        0, idx, acc, threshold=0.95,
    )
    got0 = {r["vec_id"] for r in spark.read.parquet(acc).collect()}
    assert got0 == {"a1"}  # a2 within-batch dup, d1 dup of the index

    # batch 1: another twin of a1 -> cross-BATCH dup via the appended
    # codes; plus a genuinely new vector
    b = [float(x) for x in rng.randn(16) * 6.0 - 35.0]
    ann_semantic_ingest_batch(
        _vecs(spark, [("a3", [x + 0.02 for x in a]), ("b1", b)]),
        1, idx, acc, threshold=0.95,
    )
    got1 = {r["vec_id"] for r in spark.read.parquet(acc).collect()}
    assert got1 == {"a1", "b1"}

    # replaying batch 1 must not duplicate anything
    ann_semantic_ingest_batch(
        _vecs(spark, [("a3", [x + 0.02 for x in a]), ("b1", b)]),
        1, idx, acc, threshold=0.95,
    )
    rows = spark.read.parquet(acc).collect()
    assert {r["vec_id"] for r in rows} == {"a1", "b1"} and len(rows) == 2
    # index codes grew by exactly the accepted vectors
    n_codes = spark.read.parquet(f"{idx}/codes").count()
    assert n_codes == corpus.count() + 2


def test_stream_semantic_ingest_end_to_end(spark, built, tmp_path):
    from feature_extractor_spark.streaming.incremental_semantic import (
        stream_semantic_ingest,
    )

    corpus, centers, idx0 = built
    import shutil

    idx = str(tmp_path / "idx")
    shutil.copytree(idx0, idx)
    src = str(tmp_path / "src")
    acc = str(tmp_path / "acc")
    ck = str(tmp_path / "ck")

    rng = np.random.RandomState(7)
    new1 = [float(x) for x in rng.randn(16) * 6.0 + 50.0]
    dup = [float(x) + 0.01 for x in corpus.limit(1).collect()[0]["embedding"]]
    _vecs(spark, [("s1", new1), ("s2", dup)]).write.parquet(src)

    stream = spark.readStream.schema(
        "vec_id string, embedding array<double>"
    ).parquet(src)
    q = stream_semantic_ingest(stream, idx, acc, ck).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    got = {r["vec_id"] for r in spark.read.parquet(acc).collect()}
    assert got == {"s1"}


def test_ingest_requires_existing_index(spark, tmp_path):
    from feature_extractor_spark.streaming.incremental_semantic import (
        ann_semantic_ingest_batch,
    )

    with pytest.raises(FileNotFoundError, match="missing tables"):
        ann_semantic_ingest_batch(
            _vecs(spark, [("x", [0.0] * 16)]), 0,
            str(tmp_path / "nope"), str(tmp_path / "acc"),
        )


def test_replay_restores_missing_code_append(spark, built, tmp_path):
    """r8 review: a batch that crashed BETWEEN the accepted write and the
    code append must be repaired by its replay — the history reads filter
    out the batch's own partitions, so the replay re-accepts the same
    rows (instead of self-matching them at cosine 1.0) and re-runs the
    append."""
    import shutil

    from feature_extractor_spark.streaming.incremental_semantic import (
        ann_semantic_ingest_batch,
    )

    corpus, centers, idx0 = built
    idx = str(tmp_path / "idx")
    shutil.copytree(idx0, idx)
    acc = str(tmp_path / "acc")
    rng = np.random.RandomState(123)
    v = [float(x) for x in rng.randn(16) * 6.0 + 70.0]
    ann_semantic_ingest_batch(_vecs(spark, [("c1", v)]), 0, idx, acc)
    # simulate the crash: the accepted write landed, the append vanished
    shutil.rmtree(f"{idx}/codes/batch_id=1")
    assert (
        spark.read.parquet(f"{idx}/codes").filter("batch_id = 1").count() == 0
    )
    # replay batch 0: must re-accept c1 (not self-match it) and restore
    # the missing codes partition
    ann_semantic_ingest_batch(_vecs(spark, [("c1", v)]), 0, idx, acc)
    assert {r["vec_id"] for r in spark.read.parquet(acc).collect()} == {"c1"}
    restored = spark.read.parquet(f"{idx}/codes").filter("batch_id = 1")
    assert restored.count() == 1


def test_flag_respects_stored_balance_widening(spark, built, tmp_path):
    """r8 review: the dedup probe must apply the same n_probe widening as
    ann_index_topk when the stored sample balance exceeds the limit —
    pinned by checking the widened call finds a dup the narrow one would
    with identical plumbing (balance_limit=0 forces the widening)."""
    from feature_extractor_spark.streaming.incremental_semantic import (
        flag_against_ann_index,
    )

    corpus, centers, idx = built
    base = corpus.limit(1).collect()[0]["embedding"]
    new = _vecs(spark, [("w1", [float(x) + 0.01 for x in base])])
    wide = flag_against_ann_index(
        new, idx, threshold=0.95, n_probe=1, balance_limit=0.0
    ).collect()[0]
    assert wide["is_dup"]  # widening doubled the probe set


def test_null_id_new_vector_rejected(spark, built):
    """r9 (ADVICE): a NULL-id new vector must RAISE, not slip through the
    null-unsafe candidate filter and be reported is_dup=false."""
    from feature_extractor_spark.streaming.incremental_semantic import (
        flag_against_ann_index,
    )

    corpus, centers, idx = built
    base = corpus.limit(1).collect()[0]["embedding"]
    new = _vecs(spark, [(None, [float(x) + 0.01 for x in base])])
    with pytest.raises(Exception, match="NULL .?vec_id"):
        flag_against_ann_index(new, idx, threshold=0.95)


def test_within_batch_cell_cap_guard(spark, built):
    """r9: a micro-batch concentrated in one cell trips the quadratic
    guard; a normal batch under the cap is unaffected."""
    from feature_extractor_spark.streaming.incremental_semantic import (
        _within_batch_semantic_pairs,
    )

    corpus, centers, idx = built
    # 12 near-identical vectors -> all land in one cell
    base = np.asarray(centers[0]) * 1.0
    rows = [
        (f"s{i:03d}", [float(x) + 0.001 * i for x in base]) for i in range(12)
    ]
    batch = _vecs(spark, rows)
    C = np.asarray(centers, dtype=np.float64)
    with pytest.raises(Exception, match="max_cell_rows"):
        _within_batch_semantic_pairs(
            batch, C, "vec_id", "embedding", 0.95, max_cell_rows=5
        ).collect()
    # under the cap: same batch computes pairs normally
    got = _within_batch_semantic_pairs(
        batch, C, "vec_id", "embedding", 0.95, max_cell_rows=100
    ).count()
    assert got > 0


def test_rebuild_trigger_raises_past_threshold(spark, built, tmp_path):
    """r9: once the raw accepted count exceeds max_unindexed_frac of the
    indexed corpus, the next batch RAISES with the rebuild procedure
    instead of letting step 2b's exact check grow unboundedly."""
    import shutil

    from feature_extractor_spark.streaming.incremental_semantic import (
        ann_semantic_ingest_batch,
    )

    corpus, centers, idx0 = built
    idx = str(tmp_path / "idx")
    shutil.copytree(idx0, idx)
    acc = str(tmp_path / "acc")
    rng = np.random.RandomState(17)
    # batch 0: 8 genuinely novel vectors all accepted — independent
    # random DIRECTIONS (near-orthogonal in 16-d, |cos| ~ 0.25), never
    # shared constant offsets (those would all align with the ones
    # vector and dedup against each other)
    novel = [
        (f"n{i}", [float(x) for x in rng.randn(16) * 10.0])
        for i in range(8)
    ]
    ann_semantic_ingest_batch(
        _vecs(spark, novel), 0, idx, acc, threshold=0.95,
        max_unindexed_frac=0.5,
    )
    n_acc = spark.read.parquet(acc).count()
    assert n_acc > 0.05 * corpus.count()
    # batch 1: with a tight fraction the guard trips and NAMES the
    # rebuild procedure; nothing is written for the failed batch
    one_more = _vecs(
        spark, [("x1", [float(x) for x in rng.randn(16) * 10.0])]
    )
    with pytest.raises(RuntimeError, match="build_ann_index"):
        ann_semantic_ingest_batch(
            one_more, 1, idx, acc, threshold=0.95,
            max_unindexed_frac=0.05,
        )
    assert spark.read.parquet(acc).count() == n_acc
    # below the threshold (or disabled) the same batch ingests fine
    ann_semantic_ingest_batch(
        one_more, 1, idx, acc, threshold=0.95, max_unindexed_frac=None,
    )
    assert "x1" in {r["vec_id"] for r in spark.read.parquet(acc).collect()}


def test_ingest_funnel_stats_counts_and_replay(spark, built, tmp_path):
    """r9: per-batch funnel (n_input / within-batch dup / index dup /
    raw-side dup / accepted) lands one row per batch_id and a replayed
    batch overwrites its own row instead of appending."""
    import shutil

    from feature_extractor_spark.streaming.incremental_semantic import (
        ann_semantic_ingest_batch,
    )

    corpus, centers, idx0 = built
    idx = str(tmp_path / "idx")
    shutil.copytree(idx0, idx)
    acc = str(tmp_path / "acc")
    st = str(tmp_path / "stats")
    rng = np.random.RandomState(31)
    fresh = rng.randn(16) * 6.0 + 40.0
    a = [float(x) for x in fresh]
    a_twin = [float(x) + 0.01 for x in fresh]
    indexed = corpus.limit(1).collect()[0]["embedding"]
    dup_idx = [float(x) + 0.005 for x in indexed]

    # batch 0: 1 accept + 1 within-batch dup + 1 index dup
    ann_semantic_ingest_batch(
        _vecs(spark, [("a1", a), ("a2", a_twin), ("d1", dup_idx)]),
        0, idx, acc, threshold=0.95, stats_dir=st,
    )
    s0 = spark.read.parquet(st).filter("batch_id = 0").collect()[0]
    assert (
        s0["n_input"], s0["n_within_dup"], s0["n_index_dup"],
        s0["n_raw_dup"], s0["n_accepted"],
    ) == (3, 1, 1, 0, 1)

    # batch 1: a twin of the batch-0 ACCEPT. The index flags it via the
    # appended codes (index dup), so raw-side stays 0 here; plus one
    # genuinely new vector accepted.
    b = [float(x) for x in rng.randn(16) * 6.0 - 45.0]
    ann_semantic_ingest_batch(
        _vecs(spark, [("a3", [x + 0.02 for x in a]), ("b1", b)]),
        1, idx, acc, threshold=0.95, stats_dir=st,
    )
    s1 = spark.read.parquet(st).filter("batch_id = 1").collect()[0]
    assert s1["n_input"] == 2 and s1["n_accepted"] == 1
    assert s1["n_within_dup"] == 0
    assert s1["n_index_dup"] + s1["n_raw_dup"] == 1

    # replay batch 1: stats stay one-row-per-batch with identical values
    ann_semantic_ingest_batch(
        _vecs(spark, [("a3", [x + 0.02 for x in a]), ("b1", b)]),
        1, idx, acc, threshold=0.95, stats_dir=st,
    )
    rows = spark.read.parquet(st).filter("batch_id = 1").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["n_input"], r["n_within_dup"], r["n_index_dup"],
        r["n_raw_dup"], r["n_accepted"],
    ) == (
        s1["n_input"], s1["n_within_dup"], s1["n_index_dup"],
        s1["n_raw_dup"], s1["n_accepted"],
    )
    assert spark.read.parquet(st).count() == 2
