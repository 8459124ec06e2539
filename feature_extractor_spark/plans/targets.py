"""P1 target-feature selection with the reference's error contract.

The reference resolves ``cvae_target_feature_names`` against the
preprocessor's feature list and raises a ValueError naming the FIRST
missing feature plus the available ones
(/root/reference/app/data_processor.py:86-97); the default list is the 23
names shipped in /root/reference/app/config.py:36-43 (mirrored as
``plans.config.CVAE_TARGET_FEATURE_NAMES``).

Spark-first: selection by name is pure column pruning — Catalyst pushes
it into the scan's ReadSchema, so at 100 TB only the 23 target columns
are ever read off parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from feature_extractor_spark.plans.config import CVAE_TARGET_FEATURE_NAMES


def select_targets(
    df: DataFrame,
    target_names: list[str] | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Project ``df`` down to ``keep_cols + target_names`` (order
    preserved). ``target_names=None`` uses the reference's 23-name
    default. Missing columns are a HARD error naming the first missing
    feature and the available ones — never a silent partial selection."""
    names = (
        list(target_names) if target_names is not None
        else list(CVAE_TARGET_FEATURE_NAMES)
    )
    available = df.columns
    for name in names:
        if name not in available:
            raise ValueError(
                f"One of the CVAE target features ('{name}') not found in "
                f"'feature_names' provided by PreprocessorPlugin. "
                f"Available features: {available}"
            )
    # plain-string selection resolves names literally (no SQL parsing), so
    # the reference's '-'/'&' feature names need no quoting
    return df.select(*((keep_cols or []) + names))
