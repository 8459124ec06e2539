"""Cross-round bench comparator (VERDICT r6 item 7): reads two
BENCH_r*.json artifacts and prints per-query raw and CONTROL-NORMALIZED
deltas, so round-over-round numbers stop being hand-argued against box
state. The control query (a 1-row scan + count recorded in every
artifact since r6) measures pure session/JVM/scheduler overhead; BENCH.md
logged it swinging 0.15-0.86s across one session, i.e. up to several x
of the cheap queries' whole wall-clock.

Normalization: for query q with times a (old) and b (new) and control
times ca/cb, the box-state-corrected ratio is (b/cb) / (a/ca) — each
run's times expressed in units of its own session overhead. Queries much
larger than the control are barely affected; control-sized queries stop
producing fake 2x "regressions".

r9 (VERDICT r8 item 8): artifacts now interleave the control
(before/mid/after phases) and carry BOTH estimators — min
(control_1row_count_sec, the kernel-cost floor) and median
(control_median_sec, robust to the cold first draw that made the r8
min/median ambiguous). The comparator normalizes by MEDIAN when both
artifacts carry it (falling back to min for older artifacts) and prints
both ratios so the choice is visible, not baked in.

Usage:
    python tools/bench_compare.py BENCH_r06.json BENCH_r07.json
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        raw = json.load(f)
    # artifacts wrap the bench line under "parsed"; accept a bare line too
    return raw.get("parsed", raw)


def _controls(art: dict) -> tuple:
    """(min, median) control estimators; median falls back to the min
    field for pre-r9 artifacts that did not record it."""
    cmin = float(art.get("control_1row_count_sec") or 0.0)
    cmed = float(art.get("control_median_sec") or 0.0) or cmin
    return cmin, cmed


def compare(old: dict, new: dict) -> list[tuple]:
    ca_min, ca_med = _controls(old)
    cb_min, cb_med = _controls(new)
    rows = []
    qa, qb = old.get("queries", {}), new.get("queries", {})
    for name in sorted(set(qa) | set(qb)):
        a, b = qa.get(name), qb.get(name)
        if a is None or b is None:
            rows.append((name, a, b, None, None, None))
            continue
        raw = b / a if a else float("inf")
        norm_min = (
            (b / cb_min) / (a / ca_min) if (a and ca_min and cb_min) else None
        )
        norm_med = (
            (b / cb_med) / (a / ca_med) if (a and ca_med and cb_med) else None
        )
        rows.append((name, a, b, raw, norm_min, norm_med))
    return rows


def main(argv: list[str]) -> None:
    if len(argv) != 2:
        sys.exit(__doc__)
    old, new = _load(argv[0]), _load(argv[1])
    ca_min, ca_med = _controls(old)
    cb_min, cb_med = _controls(new)
    print(
        f"old: {argv[0]}  control(min/med)={ca_min}/{ca_med}s  "
        f"headline={old.get('value')}s"
    )
    print(
        f"new: {argv[1]}  control(min/med)={cb_min}/{cb_med}s  "
        f"headline={new.get('value')}s"
    )
    if ca_med and cb_med:
        print(
            f"box-state factor (new/old control): "
            f"{cb_min / ca_min:.2f}x by min, {cb_med / ca_med:.2f}x by median"
        )
    print(
        f"{'query':<34}{'old_s':>8}{'new_s':>8}{'raw':>7}"
        f"{'n_min':>7}{'n_med':>7}"
    )
    for name, a, b, raw, norm_min, norm_med in compare(old, new):
        fa = f"{a:.3f}" if a is not None else "-"
        fb = f"{b:.3f}" if b is not None else "-"
        fr = f"{raw:.2f}x" if raw is not None else "-"
        fm = f"{norm_min:.2f}x" if norm_min is not None else "-"
        fd = f"{norm_med:.2f}x" if norm_med is not None else "-"
        print(f"{name:<34}{fa:>8}{fb:>8}{fr:>7}{fm:>7}{fd:>7}")
    sa, sb = old.get("sequences_per_sec"), new.get("sequences_per_sec")
    if sa and sb:
        print(f"headline sequences/sec: {sa} -> {sb} ({sb / sa:.2f}x raw)")
    pa = old.get("reference_parity_w144") or {}
    pb = new.get("reference_parity_w144") or {}
    wa, wb = pa.get("wall_sec"), pb.get("wall_sec")
    if wa and wb:
        # normalized parity fields are in artifacts from r8 (min) / r9
        # (median) on; derive them for older artifacts from their own
        # control so the series is complete
        na = pa.get("parity_normalized") or (wa / ca_min if ca_min else None)
        nb = pb.get("parity_normalized") or (wb / cb_min if cb_min else None)
        ma = (
            pa.get("parity_normalized_median")
            or (wa / ca_med if ca_med else None)
        )
        mb = (
            pb.get("parity_normalized_median")
            or (wb / cb_med if cb_med else None)
        )
        raw = wb / wa
        line = f"reference_parity_w144: {wa}s -> {wb}s ({raw:.2f}x raw"
        if na and nb:
            line += f", {(nb / na):.2f}x min-normalized"
        if ma and mb:
            line += f", {(mb / ma):.2f}x median-normalized"
        print(line + ")")


if __name__ == "__main__":
    main(sys.argv[1:])
