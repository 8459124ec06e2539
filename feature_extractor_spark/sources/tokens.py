"""Deterministic synthetic tokenized-sequence table (FIXTURES.md F1).

Canonical engine input per BASELINE.json input_hint:
``(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)``
plus ``ts: timestamp`` for the time axis.

Built entirely from ``spark.range`` + Column expressions — no driver-side
data, no Python UDF — so the same generator scales from 5k rows (unit tests)
to 10^9+ rows (bench) with perfect determinism: every field is a pure
function of the row id. Zipf-style skew: a fixed share of rows lands on
doc_000000 so skew-handling paths have a heavy hitter to chew on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 50257
SOURCES = ("web", "books", "code", "news")

# LCG-ish mixing constants (public-domain folklore constants; any odd
# multipliers work — determinism is what matters, not quality).
_MUL_A = 2654435761
_MUL_B = 40503


def _mix(col, salt: int):
    """Deterministic 63-bit mix of a long column; pure JVM arithmetic."""
    return F.pmod(col * F.lit(_MUL_A) + F.lit(salt) * F.lit(_MUL_B), F.lit(2**31 - 1))


def synth_tokens(
    spark: SparkSession,
    n_rows: int = 5000,
    n_docs: int = 200,
    heavy_share: int = 5,
    min_tok: int = 8,
    max_tok: int = 64,
    partitions: int | None = None,
) -> DataFrame:
    """Generate the tokens table deterministically.

    ``heavy_share``: one in every ``heavy_share`` rows is assigned to the
    heavy-hitter doc_000000 (skew fixture). Tokens are
    ``(id * A + i * B) mod VOCAB`` — reproducible per (row, position) so the
    per-row token-array equality invariant is checkable by any independent
    implementation of the same formula (see tests/test_tokens_source.py).
    """
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    df = spark.range(0, n_rows, 1, partitions)
    rid = F.col("id")

    doc_idx = F.when(F.pmod(rid, heavy_share) == 0, F.lit(0)).otherwise(
        F.pmod(_mix(rid, 1), F.lit(n_docs - 1)) + 1
    )
    n_tok = (F.pmod(_mix(rid, 2), F.lit(max_tok - min_tok + 1)) + min_tok).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda i: F.pmod(rid * _MUL_A + i.cast("long") * _MUL_B, F.lit(VOCAB)).cast("int"),
    )
    source = F.element_at(
        F.array(*[F.lit(s) for s in SOURCES]), (F.pmod(_mix(rid, 3), F.lit(len(SOURCES))) + 1).cast("int")
    )
    # per-minute base + a 1h jump every 50 rows: per-doc ts stays strictly
    # increasing (row id increases within a doc) while leaving >session-gap
    # holes for sessionization tests. Minute cadence keeps ts within pandas'
    # ns-timestamp range up to ~10^8 rows (hourly overflowed at ~5M rows).
    ts = F.timestamp_seconds(
        F.lit(1704067200)  # 2024-01-01T00:00:00Z
        + rid * 60
        + F.floor(rid / 50) * 3600
    )
    return df.select(
        F.format_string("doc_%06d", doc_idx).alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        source.alias("source"),
        ts.alias("ts"),
    )


def expected_tokens(row_id: int) -> list[int]:
    """Independent oracle of the per-row token array (token-array equality
    invariant). Mirrors the Column formula in plain Python."""
    n_tok = (((row_id * _MUL_A + 2 * _MUL_B) % (2**31 - 1)) % 57) + 8
    return [(row_id * _MUL_A + i * _MUL_B) % VOCAB for i in range(n_tok)]
