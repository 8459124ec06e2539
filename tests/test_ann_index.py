"""Persistent ANN index (operators/ann_index.py): persisted-query ==
fresh-build equality, recall bound on clustered blobs, append-without-
retrain + replay idempotency, crash-safe compaction, index-absence
raises."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _blobs(spark, n_per=40, n_clusters=4, dim=16, seed=5, offset=0):
    """Deterministic clustered vectors: cluster centers on scaled axes,
    members = center + small deterministic jitter."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 5.0
    rows = []
    for c in range(n_clusters):
        jit = rng.randn(n_per, dim) * 0.2
        for i in range(n_per):
            vid = offset + c * n_per + i
            rows.append((f"v{vid:05d}", [float(x) for x in centers[c] + jit[i]], c))
    return spark.createDataFrame(
        rows, "vec_id string, embedding array<double>, cluster int"
    )


PARAMS = dict(n_lists=4, m=8, k_codes=32, sample_size=4096, seed=23)


@pytest.fixture(scope="module")
def corpus(spark):
    return _blobs(spark).persist()


def test_persisted_index_equals_fresh_build(spark, corpus, tmp_path_factory):
    from feature_extractor_spark.operators.ann_index import (
        ann_index_topk,
        build_ann_index,
    )
    from feature_extractor_spark.operators.similarity import ivfpq_topk

    idx = str(tmp_path_factory.mktemp("annidx"))
    stats = build_ann_index(corpus, idx, residual=True, **PARAMS)
    assert stats["n_vectors"] == corpus.count()
    queries = corpus.filter(F.col("vec_id").isin("v00000", "v00050", "v00110"))
    fresh = ivfpq_topk(
        queries, corpus, k=5, n_probe=2, residual=True, **PARAMS
    )
    persisted = ann_index_topk(queries, idx, k=5, n_probe=2)
    a = {(r["query_id"], r["rank"]): (r["neighbor_id"], round(r["adc_distance"], 9))
         for r in fresh.collect()}
    b = {(r["query_id"], r["rank"]): (r["neighbor_id"], round(r["adc_distance"], 9))
         for r in persisted.collect()}
    assert a == b and len(a) == 15


def test_recall_bound_on_clustered_blobs(spark, corpus, tmp_path_factory):
    """Neighbors from the persisted index must overlap the exact cosine
    top-k heavily on well-separated blobs (the same bound the inline
    ivfpq test enforces)."""
    from feature_extractor_spark.operators.ann_index import (
        ann_index_topk,
        build_ann_index,
    )
    from feature_extractor_spark.operators.similarity import cosine_topk

    idx = str(tmp_path_factory.mktemp("annidx_recall"))
    build_ann_index(corpus, idx, residual=True, **PARAMS)
    queries = corpus.limit(10)
    exact = cosine_topk(queries, corpus, k=5)
    approx = ann_index_topk(queries, idx, k=5, n_probe=2)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(ex[q] & ap.get(q, set())) for q in ex)
    total = sum(len(v) for v in ex.values())
    # same recall envelope the inline ivfpq test enforces: intra-blob
    # neighbors are near-equidistant, so PQ quantization reorders the
    # tail of the top-k — 0.5 is the established usable-recall floor
    assert hits / total >= 0.5, (hits, total)


def test_append_replay_idempotent_and_queryable(spark, corpus, tmp_path_factory):
    from feature_extractor_spark.operators.ann_index import (
        ann_index_append,
        ann_index_topk,
        build_ann_index,
    )

    idx = str(tmp_path_factory.mktemp("annidx_append"))
    build_ann_index(corpus, idx, residual=True, **PARAMS)
    # new vectors near cluster 0's center: offset ids, same generator
    newbies = _blobs(spark, n_per=5, n_clusters=1, seed=5, offset=9000)
    n = ann_index_append(newbies, idx, batch_id=1)
    assert n == 5
    # replay (at-least-once): same batch_id overwrites its own partition
    n2 = ann_index_append(newbies, idx, batch_id=1)
    assert n2 == 5
    total = spark.read.parquet(f"{idx}/codes").count()
    assert total == corpus.count() + 5
    # appended vectors are immediately searchable and find cluster 0
    q = newbies.limit(2)
    res = ann_index_topk(q, idx, k=3, n_probe=2).collect()
    assert len(res) == 6
    neigh = {r["neighbor_id"] for r in res}
    assert any(nid.startswith("v090") for nid in neigh) or any(
        int(nid[1:]) < 40 for nid in neigh if nid.startswith("v0")
    )
    # batch_id=0 / negative are reserved
    with pytest.raises(ValueError, match="batch_id must be > 0"):
        ann_index_append(newbies, idx, batch_id=0)


def test_compaction_preserves_results(spark, corpus, tmp_path_factory):
    from feature_extractor_spark.operators.ann_index import (
        ann_index_append,
        ann_index_topk,
        build_ann_index,
        compact_ann_index,
    )

    idx = str(tmp_path_factory.mktemp("annidx_compact"))
    build_ann_index(corpus, idx, residual=True, **PARAMS)
    newbies = _blobs(spark, n_per=5, n_clusters=1, seed=9, offset=9500)
    ann_index_append(newbies, idx, batch_id=1)
    queries = corpus.limit(5)
    before = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in ann_index_topk(queries, idx, k=5).collect()
    }
    stats = compact_ann_index(spark, idx)
    assert stats["codes_files"] >= 1
    # all history merged into batch_id=-1; results unchanged
    parts = set(
        spark.read.parquet(f"{idx}/codes").select("batch_id").distinct()
        .toPandas()["batch_id"]
    )
    assert parts == {-1}
    after = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in ann_index_topk(queries, idx, k=5).collect()
    }
    assert before == after


def test_missing_index_raises(spark, corpus, tmp_path_factory):
    from feature_extractor_spark.operators.ann_index import (
        ann_index_append,
        ann_index_topk,
    )

    idx = str(tmp_path_factory.mktemp("annidx_missing")) + "/nope"
    with pytest.raises(FileNotFoundError, match="missing tables"):
        ann_index_topk(corpus.limit(1), idx)
    with pytest.raises(FileNotFoundError, match="missing tables"):
        ann_index_append(corpus.limit(1), idx, batch_id=1)


def test_autosize_n_lists_scales_with_corpus(spark, tmp_path):
    """r9: build_ann_index with default (None) n_lists derives the list
    count from a corpus count — a 10x corpus gets ~10x the lists, so the
    mean cell stays ~target_cell_rows without caller tuning (the fixed
    16-list default would make every probe scan 25% of all codes at
    100x)."""
    from feature_extractor_spark.operators.ann_index import build_ann_index

    small = _blobs(spark, n_per=20, n_clusters=4)  # 80 vectors
    big = _blobs(spark, n_per=200, n_clusters=4)  # 800 vectors
    idx_s = str(tmp_path / "s")
    idx_b = str(tmp_path / "b")
    st_s = build_ann_index(small, idx_s, target_cell_rows=40)
    st_b = build_ann_index(big, idx_b, target_cell_rows=40)
    assert st_s["n_lists"] == 2 and st_b["n_lists"] == 20
    # mean cell size stays at ~target for both scales
    for idx, st in ((idx_s, st_s), (idx_b, st_b)):
        mean_cell = st["n_vectors"] / st["n_lists"]
        assert mean_cell <= 40 * 1.01
    # meta carries the indexed-corpus size (the rebuild trigger's anchor)
    meta = spark.read.parquet(f"{idx_b}/meta").collect()[0].asDict()
    assert meta["n_vectors"] == 800 and meta["n_lists"] == 20


def test_autosize_balance_under_widening_threshold_on_uniform(spark, tmp_path):
    """r8 verdict 'done' criterion: an auto-sized default build over
    uniform (unclustered) vectors stores a balance below the n_probe
    widening threshold — the defaults must not ship a skewed index."""
    import numpy as np

    from feature_extractor_spark.operators.ann_index import build_ann_index

    rng = np.random.RandomState(41)
    rows = [
        (f"u{i:05d}", [float(x) for x in rng.randn(16)]) for i in range(2000)
    ]
    corpus = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    st = build_ann_index(corpus, str(tmp_path / "u"), target_cell_rows=100)
    assert st["n_lists"] == 20
    assert st["balance"] < 4.0  # the ann_index_topk widening threshold


def test_rebuild_crash_leaves_no_servable_mixed_index(spark, tmp_path):
    """r9 review: build_ann_index deletes the OLD meta before writing
    anything, so a crash mid-rebuild cannot leave the previous build's
    meta pairing with new model tables — the index becomes meta-less
    and every consumer fails loudly until the rebuild completes."""
    import pytest as _pt

    from feature_extractor_spark.operators.ann_index import (
        ann_index_topk,
        build_ann_index,
    )

    corpus = _blobs(spark, n_per=10, n_clusters=4)
    idx = str(tmp_path / "idx")
    build_ann_index(corpus, idx, residual=True, **PARAMS)

    # simulate the crash window: a rebuild's first action (meta delete)
    # happened, nothing else was written yet
    class _Boom(RuntimeError):
        pass

    import feature_extractor_spark.operators.ann_index as ai

    orig = ai.kmeans_centroids

    def boom(*a, **k):
        raise _Boom("crash mid-rebuild")

    ai.kmeans_centroids = boom
    try:
        with _pt.raises(_Boom):
            build_ann_index(corpus, idx, residual=True, **PARAMS)
    finally:
        ai.kmeans_centroids = orig
    # the half-rebuilt index is NOT servable (meta gone -> loud failure)
    with _pt.raises(FileNotFoundError, match="meta"):
        ann_index_topk(corpus.limit(1), idx, k=3)
    # completing the rebuild restores service
    build_ann_index(corpus, idx, residual=True, **PARAMS)
    assert ann_index_topk(corpus.limit(1), idx, k=3).count() > 0
