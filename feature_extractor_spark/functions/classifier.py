"""Seed-set quality classifier (GPT-3 / CCNet family, public method).

The OTHER classic web-corpus quality filter (Brown et al. 2020, GPT-3
appendix A; also the fastText filters of CCNet/phi lineages): train a
LINEAR classifier to separate a trusted "high-quality" seed set from the
raw corpus, score every document with it, and keep documents with a
probability-weighted acceptance (Pareto-thresholded in GPT-3, so some
lower-scored docs survive and the kept set is not a hard cliff).

This implementation is dependency-free and Spark-first:

- features: hashed bag-of-words (the hashing trick) — each lowercased
  word maps to ``fnv1a64(word) % dim`` with a sign bit (the hash lives
  only inside this module's train/apply passes, so no JVM twin is
  needed), making the feature space fixed-width with NO vocabulary
  state to ship; L2-normalized per document.
- training: full-batch logistic regression with L2, run as ``iters``
  Spark jobs — each job computes per-partition gradient PARTIALS with
  one Arrow pass (``mapInPandas`` emitting a single dense gradient row
  per partition) that the driver sums and steps. The training input is
  a BOUNDED seeded sample per class (``sample_per_class``, same
  discipline as kmeans_centroids / train_char_lm): the classifier is
  trained on a bounded set and APPLIED to the whole corpus — exactly
  how the production filters operate at web scale, where the expensive
  side is the apply pass, not the fit.
- apply: weights broadcast once; scoring is one Arrow map pass, no
  shuffle (plan-pinned in tests).
- selection: ``quality_sample`` keeps doc d iff
  ``u(d) < score(d)^alpha`` where ``u(d)`` is a DETERMINISTIC per-doc
  uniform from xxhash64(id, seed) — the GPT-3 Pareto-style soft keep
  made reproducible (no RNG state; replays keep the same docs).

Determinism: seeded samples, fixed iteration count, float64 driver
steps, and a fixed partition count for the gradient pass (round-robin
repartition of the deterministic TakeOrdered sample), so the same
inputs always fit the same weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M31 = (1 << 31) - 1


_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3


def _hash_features_scalar(texts, dim: int, ngram: int = 1):
    """Reference (per-byte Python FNV-1a) form of the featurizer — the
    parity oracle for the vectorized ``_hash_features`` below (which the
    corpus-wide scoring pass uses; VERDICT r9 item 1). Semantics: each
    gram hashes via 64-bit FNV-1a over its UTF-8 bytes; top bit is the
    sign, ``h % dim`` the bucket; per-doc signed counts, L2-normalized."""
    import numpy as np

    out = []
    mask = (1 << 64) - 1

    def fnv(s: bytes) -> int:
        h = _FNV_OFFSET
        for b in s:
            h = ((h ^ b) * _FNV_PRIME) & mask
        return h

    for t in texts:
        if t is None:
            out.append((np.empty(0, np.int64), np.empty(0, np.float64)))
            continue
        ws = t.lower().split()
        grams = list(ws)
        if ngram >= 2:
            grams += [a + "\x1f" + b for a, b in zip(ws, ws[1:])]
        counts: dict[int, float] = {}
        for g in grams:
            h = fnv(g.encode("utf-8"))
            sign = 1.0 if (h >> 63) == 0 else -1.0
            counts[h % dim] = counts.get(h % dim, 0.0) + sign
        if not counts:
            out.append((np.empty(0, np.int64), np.empty(0, np.float64)))
            continue
        idx = np.fromiter(counts.keys(), np.int64, len(counts))
        val = np.fromiter(counts.values(), np.float64, len(counts))
        n = np.linalg.norm(val)
        out.append((idx, val / (n if n > 0 else 1.0)))
    return out


def _fnv_batch(grams: list, dim: int):
    """Vectorized FNV-1a over a list of (unique) byte-strings: one NumPy
    pass per BYTE POSITION instead of a Python loop per byte. Grams are
    processed sorted by length descending so the still-live set at byte
    j is a prefix slice, never a boolean gather. Returns (bucket int64,
    sign float64) arrays aligned with ``grams``. Bit-identical to the
    scalar ``fnv`` (uint64 wraparound is exactly the & mask)."""
    import numpy as np

    n = len(grams)
    lens = np.fromiter(map(len, grams), np.int64, n)
    order = np.argsort(-lens, kind="stable")
    l_sorted = lens[order]
    buf = np.frombuffer(b"".join([grams[i] for i in order]), dtype=np.uint8)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(l_sorted, out=offs[1:])
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    prime = np.uint64(_FNV_PRIME)
    maxlen = int(l_sorted[0]) if n else 0
    rev = l_sorted[::-1]
    for j in range(maxlen):
        k = n - int(np.searchsorted(rev, j, side="right"))
        col = buf[offs[:k] + j]  # byte j of every gram longer than j
        h[:k] = (h[:k] ^ col.astype(np.uint64)) * prime
    out_h = np.empty_like(h)
    out_h[order] = h
    sign = np.where((out_h >> np.uint64(63)) == 0, 1.0, -1.0)
    bucket = (out_h % np.uint64(dim)).astype(np.int64)
    return bucket, sign


def _featurize_flat(texts, dim: int, ngram: int = 1):
    """Flat-array core of the featurizer (vectorized twin of
    ``_hash_features_scalar``, same math): grams are INTERNED per batch
    (real corpora are Zipf — unique grams are a small fraction of gram
    instances), FNV-1a runs once per unique gram through ``_fnv_batch``,
    and per-doc signed bucket counts come from one sort + reduceat
    instead of a Python dict per doc.

    Returns ``(ubucket, uval, doc_bounds)``: for doc d, its sparse row
    is ``ubucket[doc_bounds[d]:doc_bounds[d+1]]`` with L2-normalized
    values ``uval[...]``; docs with no grams (None/empty) own an empty
    slice."""
    import numpy as np

    intern: dict[str, int] = {}
    si = intern.setdefault
    gram_ids: list[int] = []
    n_docs = len(texts)
    n_per_doc = np.zeros(n_docs, np.int64)
    for d, t in enumerate(texts):
        if t is None:
            continue
        ws = t.lower().split()
        if ngram >= 2:
            ws = ws + [a + "\x1f" + b for a, b in zip(ws, ws[1:])]
        # si(g, len(intern)): the default is evaluated BEFORE insertion,
        # so an unseen gram gets id == current table size
        gram_ids.extend([si(g, len(intern)) for g in ws])
        n_per_doc[d] = len(ws)

    if not gram_ids:
        z = np.zeros(n_docs + 1, np.int64)
        return np.empty(0, np.int64), np.empty(0, np.float64), z

    # encode only UNIQUE grams (dict preserves insertion order == id order)
    bucket_u, sign_u = _fnv_batch([g.encode("utf-8") for g in intern], dim)
    gid = np.asarray(gram_ids, dtype=np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_per_doc)
    key = doc_idx * np.int64(dim) + bucket_u[gid]
    korder = np.argsort(key, kind="stable")
    ks = key[korder]
    ss = sign_u[gid][korder]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    uval = np.add.reduceat(ss, starts)
    ukeys = ks[starts]
    ubucket = ukeys % dim
    doc_bounds = np.searchsorted(ukeys // dim, np.arange(n_docs + 1))
    # L2-normalize per doc: segment norms via reduceat over the occupied
    # (strictly increasing) segment starts only
    counts = np.diff(doc_bounds)
    ne = counts > 0
    if ne.any():
        seg_starts = doc_bounds[:-1][ne]
        norms = np.sqrt(np.add.reduceat(uval * uval, seg_starts))
        norms[norms == 0.0] = 1.0
        uval = uval / np.repeat(norms, counts[ne])
    return ubucket, uval, doc_bounds


def _hash_features(texts, dim: int, ngram: int = 1):
    """NumPy hashed-BoW featurizer for a batch of texts: returns a list
    of (idx array, val array) L2-normalized sparse rows. ``ngram=2``
    additionally hashes adjacent word bigrams (the fastText-family
    recipe — quality signals like "click here" live in bigrams unigram
    bags cannot see). Python-side xxhash is not available; the 64-bit
    FNV-1a is the SAME hash the JVM side never needs to reproduce
    (features exist only inside this module's train and apply passes,
    which share it). Vectorized (r10): gram interning + batch FNV +
    sort/reduceat bucket counts — see ``_featurize_flat``; parity with
    the scalar reference form is pinned in tests."""
    import numpy as np  # noqa: F401

    ubucket, uval, doc_bounds = _featurize_flat(texts, dim, ngram)
    out = []
    for d in range(len(texts)):
        lo, hi = doc_bounds[d], doc_bounds[d + 1]
        out.append((ubucket[lo:hi], uval[lo:hi]))
    return out


def _bounded_sample(df: DataFrame, id_col: str, text_col: str, n: int, seed: int):
    """Deterministic bounded sample: TakeOrdered over a seeded id hash
    (map-side partial top-k, never a full collect). The id is the
    tie-break key — the hash lives in only 2^31 values, so two ids
    colliding at the limit boundary would otherwise make the drawn
    sample (and the fitted weights) depend on partitioning."""
    return (
        df.select(id_col, text_col)
        .orderBy(
            F.pmod(
                F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)),
                F.lit(_M31),
            ),
            F.col(id_col),
        )
        .limit(int(n))
        .select(text_col)
    )


def resolve_classifier(clf) -> "tuple":
    """Normalize the ``(weights, bias[, ngram])`` tuple every consumer
    (curate, the streaming ingest, direct score_quality callers) shares
    to ``(weights, bias, ngram)`` — the positional convention lives
    HERE, next to the trainer that produces it, not at each call site."""
    if len(clf) == 2:
        return clf[0], clf[1], 1
    return clf[0], clf[1], int(clf[2])


def train_quality_classifier(
    quality_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1 << 18,
    iters: int = 25,
    lr: float = 2.0,
    l2: float = 1e-4,
    sample_per_class: int = 10_000,
    seed: int = 17,
    n_parts: int = 32,
    ngram: int = 1,
) -> "tuple":
    """Fit the seed-vs-corpus logistic regression; returns
    ``(weights: np.ndarray (dim,), bias: float)``.

    ``quality_docs`` is the trusted seed set (label 1), ``corpus_docs``
    the raw corpus (label 0 — the standard noisy-negative assumption).
    Each class contributes a bounded seeded sample; gradients are
    full-batch over the combined sample, computed distributed (one
    Arrow pass per iteration, one dense partial per partition) and
    stepped on the driver in float64.

    Scale notes: driver memory is O(dim) (2 MB at the default 2^18);
    per-iteration traffic is ``n_parts * dim * 8`` bytes of partials —
    keep ``n_parts`` modest (the sample is bounded, so 32 partitions
    hold it comfortably; this is NOT the corpus-wide pass)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = quality_docs.sparkSession
    pos = _bounded_sample(quality_docs, id_col, text_col, sample_per_class, seed)
    neg = _bounded_sample(
        corpus_docs, id_col, text_col, sample_per_class, seed + 1
    )
    train = (
        pos.withColumn("__y", F.lit(1.0))
        .unionByName(neg.withColumn("__y", F.lit(0.0)))
        .repartition(int(n_parts))  # deterministic partial count
    )
    # featurize ONCE (review r9): the per-byte Python FNV hashing is the
    # dominant fit cost, and re-running it inside every gradient pass
    # would pay it `iters` times over. One Arrow pass caches the sparse
    # (idx, val, y) rows; the iteration loop then touches only the cheap
    # gradient math.
    feat_schema = T.StructType(
        [
            T.StructField("idx", T.ArrayType(T.LongType())),
            T.StructField("val", T.ArrayType(T.DoubleType())),
            T.StructField("__y", T.DoubleType()),
        ]
    )

    def featurize(batches):
        for pdf in batches:
            feats = _hash_features(pdf[text_col], dim, ngram)
            yield pd.DataFrame(
                {
                    "idx": [i.tolist() for i, _ in feats],
                    "val": [v.tolist() for _, v in feats],
                    "__y": pdf["__y"],
                }
            )

    train_feat = train.mapInPandas(featurize, feat_schema).persist()
    n_total = train_feat.count()  # materializes the cache
    if n_total == 0:
        raise ValueError("train_quality_classifier: empty training sample")

    grad_schema = T.StructType(
        [
            T.StructField("g", T.ArrayType(T.DoubleType())),
            T.StructField("gb", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    try:
        for _ in range(int(iters)):
            bw = spark.sparkContext.broadcast((w, b))

            def partial(batches):
                ww, bb = bw.value
                g = np.zeros(dim, dtype=np.float64)
                gb = 0.0
                n = 0
                for pdf in batches:
                    ys = pdf["__y"].to_numpy()
                    for idx_l, val_l, y in zip(pdf["idx"], pdf["val"], ys):
                        idx = np.asarray(idx_l, dtype=np.int64)
                        val = np.asarray(val_l, dtype=np.float64)
                        z = float(val @ ww[idx]) + bb
                        p = 1.0 / (1.0 + np.exp(-z))
                        err = p - y
                        np.add.at(g, idx, err * val)
                        gb += err
                        n += 1
                yield pd.DataFrame(
                    {"g": [g.tolist()], "gb": [gb], "n": [n]}
                )

            parts = train_feat.mapInPandas(partial, grad_schema).collect()
            g = np.zeros(dim, dtype=np.float64)
            gb = 0.0
            for r in parts:
                g += np.asarray(r["g"], dtype=np.float64)
                gb += r["gb"]
            g = g / n_total + l2 * w
            gb = gb / n_total
            w = w - lr * g
            b = b - lr * gb
            bw.destroy()
    finally:
        train_feat.unpersist()
    return w, float(b)


def score_quality(
    docs: DataFrame,
    weights,
    bias: float,
    text_col: str = "text",
    out_col: str = "quality_score",
    ngram: int = 1,
) -> DataFrame:
    """Sigmoid classifier score per document — one Arrow MAP pass, no
    shuffle (weights broadcast once). NULL text scores NULL."""
    import numpy as np
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    spark = docs.sparkSession
    w = np.asarray(weights, dtype=np.float64)
    dim = len(w)
    ng = int(ngram)  # MUST match the ngram the classifier was trained with
    bw = spark.sparkContext.broadcast((w, float(bias)))
    schema = T.StructType(
        list(docs.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def run(batches):
        ww, bb = bw.value
        for pdf in batches:
            texts = pdf[text_col]
            ubucket, uval, doc_bounds = _featurize_flat(texts, dim, ng)
            # one reduceat over the flat (weight * value) products scores
            # every doc in the batch — no per-doc Python at all
            counts = np.diff(doc_bounds)
            z = np.zeros(len(texts), np.float64)
            ne = counts > 0
            if ne.any():
                contrib = ww[ubucket] * uval
                z[ne] = np.add.reduceat(contrib, doc_bounds[:-1][ne])
            s = 1.0 / (1.0 + np.exp(-(z + bb)))
            scores = [
                None if t is None else float(v) for t, v in zip(texts, s)
            ]
            pdf = pdf.copy()
            pdf[out_col] = scores
            yield pdf

    return docs.mapInPandas(run, schema)


def quality_sample(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
    alpha: float = 2.0,
    seed: int = 29,
) -> DataFrame:
    """GPT-3-style soft keep, made deterministic: keep doc d iff
    ``u(d) < score^alpha`` with ``u(d)`` a per-doc uniform derived from
    ``xxhash64(id, seed)`` — high-scored docs almost always survive,
    low-scored docs survive with small probability (no hard cliff), and
    a replay keeps exactly the same docs. Pure JVM expressions — this
    IS the corpus-wide pass, so it must not touch Python."""
    u = (
        F.pmod(
            F.xxhash64(F.col(id_col).cast("string"), F.lit(int(seed))),
            F.lit(_M31),
        ).cast("double")
        / float(_M31)
    )
    return scored.filter(
        F.col(score_col).isNotNull()
        & (u < F.pow(F.col(score_col), F.lit(float(alpha))))
    )
