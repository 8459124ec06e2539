"""Deduplication operators for training-data pipelines.

- exact_dedup: hash-groupBy on normalized text (md5). One shuffle on the
  digest; the canonical survivor is min(doc_id) — deterministic.
- jaccard_pairs: exact word-set Jaccard via explode + equi-join on token.
  Classic candidate-pair generation: |A∩B| from the token join, |A∪B| =
  |A|+|B|-|A∩B|. Shuffles on the token key; frequent tokens are the skew
  risk, so tokens above a document-frequency cap are dropped (standard
  trick — a token in >X% of docs has no discriminative power anyway).
- minhash_lsh_pairs: MinHash signatures (K permutations via affine hashes of
  the 64-bit xxhash of each shingle) -> LSH banding -> candidates join only
  within buckets -> exact Jaccard verify. The scale path: candidate count
  grows with collisions, not with N^2.
- simhash: 64-bit SimHash fingerprint from per-token hashes; near-dup =
  Hamming distance <= k (exposed as fingerprint + band keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_extractor_spark.functions.text import words


def _norm_text(text_col: str):
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group identical (normalized) texts; keep min(id) as canonical.
    Returns (digest, canonical_id, n_dups)."""
    return (
        df.select(F.md5(_norm_text(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) pairs, distinct tokens per doc (set semantics)."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.array_distinct(F.transform(words(F.col(text_col)), F.lower))).alias(
                "token"
            ),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Exact word-set Jaccard similarity for all pairs sharing >=1 token.

    ``max_df_ratio`` drops tokens present in more than that share of docs
    (skew guard + noise filter) BEFORE the self-join.
    Returns (id_a, id_b, inter, size_a, size_b, jaccard) with id_a < id_b.
    """
    toks = _doc_tokens(df, id_col, text_col)
    if max_df_ratio is not None:
        n_docs = df.count()
        dfreq = toks.groupBy("token").agg(F.countDistinct(id_col).alias("df"))
        keep = dfreq.filter(F.col("df") <= max_df_ratio * n_docs).select("token")
        toks = toks.join(F.broadcast(keep), "token")
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))

    a = toks.select(F.col(id_col).alias("id_a"), "token")
    b = toks.select(F.col(id_col).alias("id_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")


# ---------------------------------------------------------------------------
# MinHash + LSH

# 2^31-1: keeps a*h + b < 2^62, safe under ANSI long arithmetic
_M31 = (1 << 31) - 1


def _minhash_signature(shingles_col, k: int, seed: int = 7):
    """K affine-permutation minhashes over xxhash64(shingle). All built-in:
    transform + aggregate, no UDF."""
    import random

    rnd = random.Random(seed)
    params = [(rnd.randrange(1, _M31), rnd.randrange(0, _M31)) for _ in range(k)]

    def perm(a, b):
        # single-arg lambda required: PySpark derives HOF arity from the
        # Python signature, so default-arg capture would break it
        return lambda s: F.pmod(
            F.pmod(F.xxhash64(s), F.lit(_M31)) * F.lit(a) + F.lit(b), F.lit(_M31)
        )

    sigs = [F.array_min(F.transform(shingles_col, perm(a, b))) for a, b in params]
    return F.array(*sigs)


def shingles(text_col: str, n: int = 3):
    """Word n-gram shingles as strings (built-in: transform over an index
    sequence + slice + concat)."""
    ws = F.transform(words(F.col(text_col)), F.lower)
    count = F.size(ws) - (n - 1)
    return F.when(count > 0, F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
    )).otherwise(F.array().cast("array<string>"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash/LSH near-dup candidate pairs with exact-Jaccard verification
    on the shingle sets of the candidates only.

    rows = bands implies num_hashes % bands == 0; candidate pairs share at
    least one identical band. Only candidates are verified — the N^2 term
    never materializes.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sh = shingles(text_col, shingle_n)
    docs = df.select(F.col(id_col), sh.alias("sh")).filter(F.size("sh") > 0)
    sig = docs.withColumn("sig", _minhash_signature(F.col("sh"), num_hashes))

    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", i * rows_per_band + j + 1)
                            for j in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for i in range(bands)
        ]
    )
    banded = sig.select(id_col, "sh", F.explode(band_structs).alias("bb")).select(
        id_col, "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), "band", "bucket"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), "band", "bucket"
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash: sum of ±1 per bit over token hashes, sign -> bit.
    Bit b of xxhash64(token) contributes +1 if set else -1; fingerprint bit
    b = 1 iff the sum is positive. All built-in expressions."""
    toks = F.transform(words(F.col(text_col)), F.lower)
    hashed = F.transform(toks, lambda t: F.xxhash64(t))
    def bit_sum(b):
        return F.aggregate(
            hashed,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    bit_sums = [bit_sum(b) for b in range(bits)]
    fp = None
    for b, s in enumerate(bit_sums):
        bit = F.when(s > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseOR(term)
    return df.select(F.col(id_col), fp.alias("simhash"))
