"""Generate an sf1.0-SCALE measurement dataset at /root/testdata_big/sf1.0.

The driver's real sf1.0 is generated at measurement time and is not
available in this sandbox; this produces a statistically similar 10x
scale-up of the sf0.1 tables (same schemas, same vocab/length/dup
structure for documents, same user/event shape for events, dim-64
embeddings) so heavy text/encoder/ANN queries can be timed at the
driver's measurement scale. TPC-H-ish tables are hardlinked from sf0.1
(q1/q3 are not scale-critical this round). Deterministic (numpy seed 42).
"""
import os
import shutil

import numpy as np

OUT = "/root/testdata_big/sf1.0"
SRC = "/root/testdata/sf0.1"

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "shuffle", "cache", "plan", "index",
]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def gen_documents(spark, n=50_000):
    rng = np.random.RandomState(42)
    n_words = rng.randint(10, 101, size=n)
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    sources = [f"src{i % 20}" for i in range(n)]
    vocab = np.array(VOCAB)
    texts = []
    for i in range(n):
        texts.append(" ".join(vocab[rng.randint(0, len(vocab), n_words[i])]))
    # plant exact duplicates at the sf0.1 rate (~8 groups / 5000 docs)
    for g in range(80):
        src = rng.randint(0, n)
        dst = rng.randint(0, n)
        texts[dst] = texts[src]
    rows = [
        (i, texts[i], str(langs[i]), sources[i], len(texts[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.repartition(8).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")


def gen_events(spark, n=1_000_000, n_users=15_000):
    import pandas as pd

    rng = np.random.RandomState(43)
    ts0 = np.datetime64("2024-01-01T00:00:00")
    ts = ts0 + np.sort(
        rng.randint(0, 30 * 86400 * 1000, size=n)
    ).astype("timedelta64[ms]")
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.randint(0, n_users, size=n).astype(np.int64),
            "event_type": np.array(
                ["signup", "click", "error", "view", "purchase"]
            )[rng.randint(0, 5, size=n)],
            "value": rng.rand(n) * 100.0,
            "props": [f'{{"k": {int(k)}}}' for k in rng.randint(0, 100, size=n)],
        }
    )
    df = spark.createDataFrame(pdf)
    df.repartition(16).write.mode("overwrite").parquet(f"{OUT}/events.parquet")


def gen_embeddings(spark, n=8_000, dim=64):
    rng = np.random.RandomState(44)
    centers = rng.randn(10, dim) * 2.0
    labels = rng.randint(0, 10, size=n)
    vecs = centers[labels] + rng.randn(n, dim)
    rows = [
        (int(i), [float(x) for x in vecs[i]], int(labels[i])) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.repartition(4).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")


def main():
    os.makedirs(OUT, exist_ok=True)
    import sys

    sys.path.insert(0, "/root/repo")
    from feature_extractor_spark.session import get_spark

    spark = get_spark("gen-sf1", cores=32)
    gen_documents(spark)
    gen_events(spark)
    gen_embeddings(spark)
    # hardlink the TPC-H-ish tables + region control from sf0.1
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem",
    ]:
        src = f"{SRC}/{t}.parquet"
        dst = f"{OUT}/{t}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.unlink(dst)
        if os.path.isdir(src):
            shutil.copytree(src, dst, copy_function=os.link)
        else:
            os.link(src, dst)
    print("DONE", OUT)


if __name__ == "__main__":
    main()
