"""Hardware scaling-ceiling measurement for this sandbox.

The north rule's scaling criterion assumes N and 4N EXECUTORS — separate
machines, each bringing its own cores (at their own clock) and its own DRAM
channels. The local-mode analog (taskset 8 cores vs all 32 on ONE box)
shares a single frequency budget and one memory system, so even a perfectly
parallel job cannot reach efficiency 1.0 here. This script measures the
box's actual ceilings so BENCH.md can report pipeline efficiency against
them:

- ALU ceiling: a pure-register spin loop (zero memory traffic, zero
  synchronization). Per-core rate at 32 procs / per-core rate at 8 procs =
  the frequency/steal ceiling any compute-bound job inherits.
- DRAM ceiling: a STREAM-like add over 16 MB arrays. Aggregate bandwidth at
  32 procs / at 8 procs (ideal: 4.0) = the ceiling for bandwidth-bound
  stages.

Usage: python tools/hw_ceiling.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _spin(_):
    t0 = time.time()
    n = 0
    x = 1.0
    while time.time() - t0 < 4:
        for _ in range(100000):
            x = x * 1.0000001 + 1e-9
        n += 100000
    return n / (time.time() - t0)


def _stream(_):
    import numpy as np

    a = np.ones(2_000_000, dtype=np.float64)  # 16 MB each: past L2
    b = np.ones(2_000_000, dtype=np.float64)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 3:
        b += a  # read a, read+write b: 3 x 16 MB per iteration
        n += 1
    return n * 3 * 16e6 / (time.time() - t0)


def _run(fn, procs: int) -> list[float]:
    with mp.get_context("spawn").Pool(procs) as p:
        return p.map(fn, range(procs))


def main() -> None:
    out: dict = {}
    spin = {p: _run(_spin, p) for p in (4, 8, 16, 32)}
    for p, rates in spin.items():
        out[f"alu_per_proc_mops_{p}"] = round(sum(rates) / len(rates) / 1e6, 2)
    out["alu_ceiling_4_to_16"] = round(
        out["alu_per_proc_mops_16"] / out["alu_per_proc_mops_4"], 3
    )
    out["alu_ceiling_8_to_32"] = round(
        out["alu_per_proc_mops_32"] / out["alu_per_proc_mops_8"], 3
    )
    bw = {p: sum(_run(_stream, p)) for p in (4, 8, 16, 32)}
    for p, v in bw.items():
        out[f"dram_gbps_{p}"] = round(v / 1e9, 1)
    out["dram_scaling_4_to_16"] = round(bw[16] / bw[4], 2)
    out["dram_scaling_8_to_32"] = round(bw[32] / bw[8], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
