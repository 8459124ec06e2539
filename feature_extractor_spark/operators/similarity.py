"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: cross join queries × corpus with the dot
  product as built-in ``aggregate(zip_with(...))`` — JVM-side, no Python.
  The query side is broadcast (it's small by construction), so the "cross
  join" is really a broadcast nested loop that streams the corpus once:
  the correct baseline at any corpus size as long as |queries| is bounded.
- LSH-bucketed variant (scale path): random-hyperplane signatures bucket
  the corpus; candidates only from matching buckets, then exact cosine
  re-rank. Recall < 1 by design; the bench compares both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Brute-force cosine top-k. Returns (query_id, neighbor_id, cosine,
    rank). Ties broken by neighbor_id (deterministic)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
    seed: int = 11,
) -> DataFrame:
    """Random-hyperplane LSH ANN: ``n_tables`` independent signatures of
    ``n_planes`` bits each; candidates = same (table, signature) bucket;
    exact cosine re-rank of candidates. Hyperplanes are seeded literals
    folded into the plan — identical on driver and executors."""
    import random

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    rnd = random.Random(seed)
    tables = [
        [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]

    def signature(vec, planes):
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(p) for p in plane]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                > 0,
                F.lit(1),
            ).otherwise(F.lit(0))
            for plane in planes
        ]
        out = F.lit(0)
        for i, b in enumerate(bits):
            out = out + F.shiftleft(b.cast("long"), i)
        return out

    def banded(df, side):
        structs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    signature(F.col(vec_col), tables[t]).alias("sig"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"{side}_v"),
            F.explode(structs).alias("b"),
        ).select(f"{side}_id", f"{side}_v", F.col("b.table").alias("table"), F.col("b.sig").alias("sig"))

    qb = banded(queries, "query")
    cb = banded(corpus, "neighbor")
    cand = (
        cb.join(F.broadcast(qb), ["table", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (
            _dot(F.col("query_v"), F.col("neighbor_v"))
            / (_norm(F.col("query_v")) * _norm(F.col("neighbor_v")))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
