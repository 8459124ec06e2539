"""Generate the committed PQ-codebook fixture for the pq_topk_adc
contract query (VERDICT r4 item 4).

The codebooks themselves are k-means products (not SQL-expressible), but
they are DETERMINISTIC (seeded sample + fixed Lloyd iterations), so they
can be committed once and treated as data. Everything downstream —
per-subspace code assignment (argmin over codewords), ADC distance
(sum over subspaces of ||q_s - codeword||^2), and the top-k ranking —
is pure relational algebra the DuckDB oracle RECOMPUTES from this file +
the embeddings table. A perturbed codebook therefore flips the driver's
value hash red (tested in tests/test_latent_fixtures.py).

Schema: (s INT, code INT, centroid DOUBLE[sub]) — one row per codeword.
Regeneration is DELIBERATE:  python tools/make_pq_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("FIXTURE_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "latents",
)

# the contract query's PQ geometry — keep in sync with pq_topk_adc
PQ_M = 8
PQ_K_CODES = 16


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feature_extractor_spark.operators.similarity import pq_codebooks
    from feature_extractor_spark.session import get_spark

    spark = get_spark("make-pq-fixture", cores=1)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books, dim = pq_codebooks(emb, m=PQ_M, k=PQ_K_CODES, sample_size=4096)
    sub = dim // PQ_M
    rows = {
        "s": [s for s in range(PQ_M) for _ in range(PQ_K_CODES)],
        "code": [c for _ in range(PQ_M) for c in range(PQ_K_CODES)],
        "centroid": [
            [float(x) for x in books[s, c]]
            for s in range(PQ_M)
            for c in range(PQ_K_CODES)
        ],
    }
    os.makedirs(OUT_DIR, exist_ok=True)
    sf_name = os.path.basename(os.path.normpath(SF_DIR))
    path = os.path.join(OUT_DIR, f"pq_codebooks_{sf_name}.parquet")
    pq.write_table(
        pa.table(
            rows,
            schema=pa.schema(
                [
                    ("s", pa.int32()),
                    ("code", pa.int32()),
                    ("centroid", pa.list_(pa.float64(), sub)),
                ]
            ),
        ),
        path,
        compression="zstd",
    )
    print(f"wrote {path}: {PQ_M * PQ_K_CODES} codewords, sub={sub}")


if __name__ == "__main__":
    main()
