"""Orchestrate the N -> 4N scaling-efficiency evidence (north rule >= 0.8).

No real multi-node cluster exists in this sandbox, so per BASELINE.md the
evidence is the SAME job on the SAME parquet input at two pinned
parallelism levels in fresh JVMs:

    efficiency = (T_N / T_4N) / 4

Protocol (round-1 pitfalls memo, BENCH.md): fresh JVM per config, taskset
pinning to a fixed core set, ParallelGC + tmpfs local dirs (session.py),
BLAS pinned to one thread per worker, warm run discarded, min-of-RUNS
steady-state walls. Interpret results against tools/hw_ceiling.py: a single
box shares one frequency budget and one memory system across both configs,
so the per-core ALU ceiling (0.91 for 4->16, 0.75 for 8->32 on this box)
is the standard a real cluster — whose added nodes bring their own clocks
and DRAM — would meet.

Usage: python tools/run_scaling.py [--rows 12000000] [--pairs 4:16,8:32]
       [--stages full,asof_window] [--runs 2]
Prints one JSON line per (pair, stage) plus a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_config(cores: int, rows: int, stage: str, runs: int, data_dir: str) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(cores),
        "SCALE_ROWS": str(rows),
        "SCALE_STAGE": stage,
        "SCALE_RUNS": str(runs),
        "SCALE_DATA": data_dir,
        # BLAS/OMP pinned: the encoder kernel parallelizes across Spark
        # tasks; nested BLAS threads oversubscribe and thrash (memo)
        "OPENBLAS_NUM_THREADS": "1",
        "OMP_NUM_THREADS": "1",
        "MKL_NUM_THREADS": "1",
    }
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        sys.executable, os.path.join(ROOT, "tools", "scaling_bench.py"),
    ]
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=3600
    )
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from cores={cores} stage={stage}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=12_000_000)
    p.add_argument("--pairs", default="4:16,8:32")
    p.add_argument("--stages", default="full,asof_window")
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--data", default="/tmp/fx_scale_tokens_r")
    args = p.parse_args()

    pairs = [tuple(int(x) for x in pr.split(":")) for pr in args.pairs.split(",")]
    stages = args.stages.split(",")
    data_dir = f"{args.data}{args.rows}"

    results = []
    for stage in stages:
        for n, n4 in pairs:
            lo = run_config(n, args.rows, stage, args.runs, data_dir)
            hi = run_config(n4, args.rows, stage, args.runs, data_dir)
            eff = (lo["wall_sec"] / hi["wall_sec"]) / (n4 / n)
            rec = {
                "stage": stage, "pair": f"{n}->{n4}", "rows": args.rows,
                "t_n": round(lo["wall_sec"], 2), "t_4n": round(hi["wall_sec"], 2),
                "seq_per_sec_n": lo.get("sequences_per_sec"),
                "seq_per_sec_4n": hi.get("sequences_per_sec"),
                "raw_efficiency": round(eff, 3),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
