"""Run the scaling pipeline once with the Spark event log enabled and print
per-stage wall-clock, task-time sums, and max-task (straggler) times.

Usage: SPARK_GRAFT_CPUS=32 python tools/stage_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    log_dir = tempfile.mkdtemp(prefix="fx_eventlog_")

    from feature_extractor_spark.session import get_spark

    spark = get_spark(
        "stage-profile",
        cores=cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    import tools.scaling_bench as sb

    sb.ensure_data(spark)
    from feature_extractor_spark.operators.skew import detect_heavy_hitters

    heavy = detect_heavy_hitters(
        spark.read.parquet(sb.DATA_DIR), "doc_id", threshold_share=0.02
    )
    if os.environ.get("SCALE_WARM", "1") != "0":
        sb.pipeline(spark, heavy).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    sb.pipeline(spark, heavy).write.format("noop").mode("overwrite").save()
    print(f"TOTAL wall: {time.time()-t0:.2f}s  (cores={cores}, W={sb.W}, rows={sb.N_ROWS})")
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log (Spark 4 writes a rolling dir per app:
    # eventlog_v2_<appId>/events_*)
    import glob

    candidates = (
        [os.path.join(log_dir, app_id)]
        + glob.glob(os.path.join(log_dir, f"eventlog_v2_{app_id}", "events_*"))
        + glob.glob(os.path.join(log_dir, "**", "events_*"), recursive=True)
    )
    path = next(p for p in candidates if os.path.isfile(p))
    stages = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                wall = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000
                stages[sid] = {
                    "name": si.get("Name", "")[:70],
                    "tasks": si.get("Number of Tasks"),
                    "wall": wall,
                }
            elif ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                info = ev.get("Task Info", {})
                dur = (info.get("Finish Time", 0) - info.get("Launch Time", 0)) / 1000
                st = stages.setdefault(sid, {})
                st["task_sum"] = st.get("task_sum", 0) + dur
                st["task_max"] = max(st.get("task_max", 0), dur)
    print(f"{'stage':>5} {'wall':>7} {'tasksum':>8} {'taskmax':>8} {'n':>4}  name")
    for sid in sorted(stages):
        s = stages[sid]
        if s.get("wall", 0) < 0.15:
            continue
        print(
            f"{sid:>5} {s.get('wall',0):>7.2f} {s.get('task_sum',0):>8.1f} "
            f"{s.get('task_max',0):>8.2f} {s.get('tasks',0):>4}  {s.get('name','')}"
        )


if __name__ == "__main__":
    main()
