"""Per-stage lineage + checkpoint/resume (SURVEY.md §4.2-5, north rule).

The reference has zero fault tolerance — a killed run restarts from scratch
(best model kept only in RAM, /root/reference/app/data_processor.py:341-351).
Here every stage writes, alongside its output, a lineage manifest recording
per-work-unit row/byte metrics; a killed job resumes by diffing the manifest
against the unit universe and recomputing only the missing units.

This is the parquet analog of an Iceberg checkpoint table + snapshot diff
(no Iceberg runtime jars in this container; the layout mirrors Iceberg's
manifest-list design so swapping the backend is a sink change, not a logic
change):

  <checkpoint_dir>/manifest/part-*.parquet   append-only commit records
  <output_dir>/<unit_col>=<v>/part-*.parquet dynamic-partition output

Exactly-once contract: outputs are committed with dynamic partition
overwrite FIRST, the manifest row is appended AFTER. A crash between the
two re-runs that unit on resume and overwrites its partition idempotently —
effectively-once output, at-least-once compute (the standard trade absent a
multi-table transaction).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointLog:
    """Append-only lineage manifest over parquet."""

    def __init__(self, spark: SparkSession, checkpoint_dir: str):
        self.spark = spark
        self.dir = checkpoint_dir
        self.manifest_dir = os.path.join(checkpoint_dir, "manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def read(self) -> DataFrame:
        schema = (
            "stage string, unit string, rows long, bytes long, "
            "n_files long, wall_sec double, committed_at timestamp, run_id string"
        )
        try:
            return self.spark.read.schema(schema).parquet(self.manifest_dir)
        except Exception:
            return self.spark.createDataFrame([], schema)

    def completed_units(self, stage: str) -> set[str]:
        return {
            r["unit"]
            for r in self.read().filter(F.col("stage") == stage).select("unit").collect()
        }

    def append(self, records: list[dict]) -> None:
        if not records:
            return
        pdf = self.spark.createDataFrame(
            [
                (
                    r["stage"],
                    str(r["unit"]),
                    int(r["rows"]),
                    int(r["bytes"]),
                    int(r["n_files"]),
                    float(r["wall_sec"]),
                    r["committed_at"],
                    r["run_id"],
                )
                for r in records
            ],
            "stage string, unit string, rows long, bytes long, n_files long, "
            "wall_sec double, committed_at timestamp, run_id string",
        )
        # one small commit file per append; readers union all files
        pdf.coalesce(1).write.mode("append").parquet(self.manifest_dir)


def _partition_stats(output_dir: str, unit_col: str, units: list[str]) -> dict[str, tuple[int, int]]:
    """(bytes, n_files) per unit from the committed files — real on-disk
    byte metrics, not estimates."""
    stats = {}
    for u in units:
        pdir = os.path.join(output_dir, f"{unit_col}={u}")
        n_bytes = n_files = 0
        if os.path.isdir(pdir):
            for f in os.listdir(pdir):
                if f.endswith(".parquet"):
                    n_bytes += os.path.getsize(os.path.join(pdir, f))
                    n_files += 1
        stats[u] = (n_bytes, n_files)
    return stats


def run_stage_with_resume(
    spark: SparkSession,
    stage_name: str,
    input_df: DataFrame,
    unit_col: str,
    transform,
    output_dir: str,
    checkpoint_dir: str,
    fail_after_units: int | None = None,
    units_per_job: int = 16,
    units: list[str] | None = None,
) -> dict:
    """Run ``transform(df_slice)`` for every pending unit and commit output +
    lineage. Units already in the manifest are skipped (resume = anti-join).

    Granularity contract: ``unit_col`` is COARSE by design — pick it like an
    Iceberg partition spec (date bucket, entity bucket; tens-to-thousands of
    units, not millions). The distinct unit list is collected to the driver,
    and each unit's slice must fit a dynamic partition.

    Job shape: pending units are grouped into batches of ``units_per_job``;
    each batch is ONE Spark job — the per-unit transformed slices are
    unioned and committed with a single dynamic-partition overwrite, so job
    count is ceil(pending/units_per_job) instead of |pending| (job-launch
    latency stops multiplying with unit count). ``transform`` still sees
    exactly one unit's slice per call, so per-unit aggregation semantics
    are unchanged, and each branch's filter pushes down to the scan.
    Per-unit row metrics come from per-branch ``observe()`` nodes riding
    the one write action — the transform executes exactly ONCE per unit
    (a count() before the write would re-run the whole plan).

    Crash contract: outputs commit first (idempotent overwrite), manifest
    rows append second, per BATCH — a crash mid-batch re-runs that whole
    batch on resume (at-least-once compute, effectively-once output).
    ``fail_after_units`` injects a crash for the kill-and-resume test
    (the injected boundary is also a batch boundary, so exactly that many
    units commit).

    Returns {"processed": [...], "skipped": [...]}.
    """
    import datetime as dt

    from pyspark.sql import Observation

    log = CheckpointLog(spark, checkpoint_dir)
    done = log.completed_units(stage_name)
    # pass `units` when the unit universe is known from a cheaper source
    # (e.g. the raw input's partition values) — the default distinct()
    # executes input_df's full plan once just to enumerate units
    all_units = (
        sorted(str(u) for u in units)
        if units is not None
        else [
            str(r[0])
            for r in input_df.select(unit_col).distinct().orderBy(unit_col).collect()
        ]
    )
    pending = [u for u in all_units if u not in done]
    run_id = uuid.uuid4().hex[:12]

    fail_at = fail_after_units if fail_after_units is not None else len(pending)
    runnable = pending[:fail_at]
    batches = [
        runnable[i : i + units_per_job]
        for i in range(0, len(runnable), units_per_job)
    ]

    from feature_extractor_spark.session import restore_conf

    processed = []
    with restore_conf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"):
        _run_batches(
            batches, input_df, transform, unit_col, stage_name, run_id,
            output_dir, log, processed,
        )
    if fail_after_units is not None and len(pending) > fail_after_units:
        raise RuntimeError(f"injected failure after {fail_after_units} units")
    return {"processed": processed, "skipped": sorted(done)}


def _run_batches(
    batches, input_df, transform, unit_col, stage_name, run_id, output_dir,
    log, processed,
) -> None:
    import datetime as dt

    from pyspark.sql import Observation

    for batch in batches:
        t0 = time.time()
        observations: dict[str, Observation] = {}
        out = None
        for unit in batch:
            df_slice = input_df.filter(F.col(unit_col).cast("string") == unit)
            branch = transform(df_slice)
            if unit_col not in branch.columns:
                branch = branch.withColumn(unit_col, F.lit(unit))
            obs = Observation(f"{stage_name}_{unit}_{run_id}")
            observations[unit] = obs
            branch = branch.observe(obs, F.count(F.lit(1)).alias("rows"))
            out = branch if out is None else out.unionByName(branch)
        # output first (idempotent dynamic-partition overwrite, one job)...
        out.write.mode("overwrite").partitionBy(unit_col).parquet(output_dir)
        batch_wall = max(time.time() - t0, 1e-6)
        stats = _partition_stats(output_dir, unit_col, batch)
        # ...manifest second (commit point), one row per unit
        log.append(
            [
                {
                    "stage": stage_name,
                    "unit": unit,
                    "rows": observations[unit].get["rows"],
                    "bytes": stats[unit][0],
                    "n_files": stats[unit][1],
                    "wall_sec": batch_wall / len(batch),
                    "committed_at": dt.datetime.utcnow(),
                    "run_id": run_id,
                }
                for unit in batch
            ]
        )
        processed.extend(batch)


# ---------------------------------------------------------------------------
# Snapshot surface (the Iceberg-snapshot analog made explicit)


def _snapshot_id(log: CheckpointLog) -> str | None:
    """Monotonic snapshot id = the latest commit timestamp in the manifest
    (append-only, so "as of commit <= T" is a consistent view)."""
    row = log.read().agg(F.max("committed_at").alias("t")).first()
    return None if row["t"] is None else row["t"].isoformat()


class Snapshot:
    """A consistent view of the lineage manifest at a point in time.

    ``CheckpointLog`` is append-only, so every committed manifest row has a
    stable ``committed_at``; a snapshot is simply "all commits at or before
    T". ``diff`` between two snapshots lists the units committed in
    between — exactly what a resuming (or incrementally consuming)
    downstream job should process, without recomputing or re-reading
    anything already consumed. This mirrors Iceberg's snapshot/
    incremental-read model on plain parquet (no Iceberg jars in this
    environment); swapping the backend changes the storage of the
    manifest, not this logic.
    """

    def __init__(self, log: CheckpointLog, as_of: str | None = None):
        self.log = log
        self.as_of = as_of if as_of is not None else _snapshot_id(log)

    def units(self, stage: str) -> set[str]:
        df = self.log.read().filter(F.col("stage") == stage)
        if self.as_of is not None:
            df = df.filter(F.col("committed_at") <= F.lit(self.as_of).cast("timestamp"))
        return {r["unit"] for r in df.select("unit").distinct().collect()}

    def diff(self, other: "Snapshot", stage: str) -> set[str]:
        """Units committed after ``other`` up to this snapshot."""
        return self.units(stage) - other.units(stage)


def current_snapshot(spark: SparkSession, checkpoint_dir: str) -> Snapshot:
    return Snapshot(CheckpointLog(spark, checkpoint_dir))
