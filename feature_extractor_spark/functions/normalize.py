"""Min/max normalization (SURVEY.md §2.1 S9, §2.3 J4, §2.4 A6).

The reference consumes a JSON of per-feature min/max
(/root/reference/app/config.py:4; examples/data/phase_3/phase_3_debug_out.json)
and applies (x - min)/(max - min). Here:

- ``fit_minmax``: one aggregation producing every column's min/max in a
  single pass (partial aggregation map-side; no per-column jobs).
- ``normalize_minmax``: applies the params as literal Column expressions —
  the params dict is driver-side tiny, so folding it into literals beats
  even a broadcast join (zero join, stays in one codegen stage).
- a broadcast-join variant is exercised in the entry queries (J4) to prove
  the join layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_minmax(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    row = df.agg(*aggs).first()
    return {c: (row[f"__min_{c}"], row[f"__max_{c}"]) for c in cols}


def normalize_minmax(
    df: DataFrame, params: dict[str, tuple[float, float]]
) -> DataFrame:
    out = df
    for c, (lo, hi) in params.items():
        rng = hi - lo
        if rng == 0:
            out = out.withColumn(c, F.lit(0.0))
        else:
            out = out.withColumn(c, (F.col(c) - F.lit(lo)) / F.lit(rng))
    return out


def denormalize_minmax(
    df: DataFrame, params: dict[str, tuple[float, float]]
) -> DataFrame:
    out = df
    for c, (lo, hi) in params.items():
        out = out.withColumn(c, F.col(c) * F.lit(hi - lo) + F.lit(lo))
    return out


def load_norm_params_json(path: str) -> dict[str, tuple[float, float]]:
    """S9 file half: read the reference's normalization JSON
    ({col: {"min": x, "max": y}}, /root/reference/app/config.py:4 +
    examples/data/phase_3/phase_3_debug_out.json) into the params dict
    normalize_minmax/denormalize_minmax consume. Unknown keys without a
    min/max pair are skipped (the reference's debug JSONs mix metrics into
    the same file)."""
    import json

    with open(path) as f:
        raw = json.load(f)
    params = {}
    for col, v in raw.items():
        if isinstance(v, dict) and "min" in v and "max" in v:
            params[col] = (float(v["min"]), float(v["max"]))
    return params
