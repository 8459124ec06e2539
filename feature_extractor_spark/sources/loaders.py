"""Sources & sinks (SURVEY.md §2.1, S1-S5).

Reproduces the reference loader's semantics (load_csv,
/root/reference/app/data_handler.py:10-75) Spark-first:

- S1 CSV scan with optional header and row cap (cap -> ``.limit`` so Catalyst
  plants a GlobalLimit instead of reading the whole file into RAM)
- S2 case-insensitive DATE_TIME detection -> proper ``timestamp`` column
  (kept as a column, never an index)
- S3 numeric coercion with errors->null->0.0 (reference:
  app/data_handler.py:60-62 does pd.to_numeric(errors='coerce').fillna(0))
- S4 headerless files named col_0..col_{n-1} (app/data_handler.py:57-58)
- S5 CSV sink (the engine's production sink is parquet/Iceberg partitioned
  by entity-bucket + day; CSV kept for reference parity)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS_COL = "ts"


def _find_datetime_col(columns: list[str]) -> str | None:
    """Case-insensitive DATE_TIME detection (reference app/data_handler.py:36-40)."""
    for c in columns:
        if c.strip().lower() in ("date_time", "datetime", "date", "ts", "timestamp"):
            return c
    return None


def load_csv(
    spark: SparkSession,
    path: str,
    headers: bool = True,
    max_rows: int | None = None,
    coerce_numeric: bool = True,
) -> DataFrame:
    """Load a CSV with reference-loader semantics on Spark.

    All parsing stays JVM-side; coercion is pure Column expressions so the
    scan + projection stay inside whole-stage codegen.
    """
    df = spark.read.csv(path, header=headers, inferSchema=False)
    if not headers:
        df = df.toDF(*[f"col_{i}" for i in range(len(df.columns))])
    if max_rows is not None:
        df = df.limit(max_rows)

    ts_col = _find_datetime_col(df.columns)
    cols = []
    if ts_col is not None:
        cols.append(F.to_timestamp(F.col(ts_col)).alias(TS_COL))
    for c in df.columns:
        if c == ts_col:
            continue
        if coerce_numeric:
            # to_numeric(errors='coerce').fillna(0): failed cast -> null -> 0.0.
            # try_cast, not cast: Spark 4 runs ANSI mode by default, where
            # cast('double') THROWS CAST_INVALID_INPUT on non-numeric cells
            # instead of yielding null.
            cols.append(
                F.coalesce(F.col(c).try_cast("double"), F.lit(0.0)).alias(c)
            )
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver-generated parquet tables."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_csv(
    df: DataFrame,
    path: str,
    include_header: bool = True,
    single_file: bool = False,
) -> None:
    """CSV sink (reference write_csv, app/data_handler.py:79-113).

    ``single_file`` coalesces to 1 partition — only for small parity outputs;
    production writes stay partitioned.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", str(include_header).lower()).csv(path)
