"""Deterministic sampling + shuffle for training-data pipelines.

`df.sample()` is seed-stable only for a FIXED partitioning — repartition
the input and the sample changes, which breaks resume-by-snapshot-diff and
cross-engine reproducibility. These operators derive the sampling decision
from a hash of the ROW ID instead: membership is a pure function of
(id, seed), independent of partitioning, cluster size, and engine.

- ``hash_uniform``: [0, 1) from the id. Two hashes: "xxhash64" (JVM,
  cheapest — the scale path) and "md5" (bit-portable to any engine with
  md5; the DuckDB oracle recomputes it exactly).
- ``deterministic_sample``: keep rows with u < fraction.
- ``stratified_sample``: per-stratum fractions (dict literal folded into
  one CASE expression — no join, no shuffle; sampling stays a map-side
  filter that composes with pushdown).
- ``deterministic_shuffle``: a stable pseudo-random sort KEY (the standard
  global training-order shuffle: ORDER BY hash). Emitting the key instead
  of sorting here lets the caller range-partition the write by it — the
  sort is the engine's problem, which is exactly where it scales.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D60 = float(1 << 60)


def hash_uniform(id_col, seed: int = 0, hash_fn: str = "xxhash64") -> Column:
    """Deterministic uniform [0, 1) from an id column."""
    sid = F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))
    if hash_fn == "md5":
        # first 15 hex digits -> 60-bit integer -> [0, 1); bit-identical in
        # any engine with md5 (DuckDB oracle parity)
        h = F.conv(F.substring(F.md5(sid), 1, 15), 16, 10).cast("long")
        return (h / F.lit(_D60)).cast("double")
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(sid), F.lit(1 << 60)) / F.lit(_D60)
    raise ValueError(f"unknown hash_fn: {hash_fn}")


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Partitioning-independent Bernoulli(fraction) sample keyed on the id."""
    return df.filter(hash_uniform(id_col, seed, hash_fn) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum Bernoulli sampling (e.g. downweight web, keep all code).
    ``fractions`` maps stratum value -> keep fraction; unlisted strata get
    ``default_fraction``. One map-side CASE filter — no join, no shuffle."""
    frac = F.lit(float(default_fraction))
    expr = None
    for value, f in fractions.items():
        cond = F.col(strata_col) == F.lit(value)
        expr = F.when(cond, F.lit(float(f))) if expr is None else expr.when(
            cond, F.lit(float(f))
        )
    frac = frac if expr is None else expr.otherwise(frac)
    return df.filter(hash_uniform(id_col, seed, hash_fn) < frac)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Append a stable pseudo-random sort key; ORDER BY it (or
    repartitionByRange + sortWithinPartitions for a partitioned write) is
    the deterministic global training-order shuffle."""
    return df.withColumn(key_col, hash_uniform(id_col, seed, hash_fn))
