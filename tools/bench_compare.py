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


def compare(old: dict, new: dict) -> list[tuple]:
    ca = float(old.get("control_1row_count_sec") or 0.0)
    cb = float(new.get("control_1row_count_sec") or 0.0)
    rows = []
    qa, qb = old.get("queries", {}), new.get("queries", {})
    for name in sorted(set(qa) | set(qb)):
        a, b = qa.get(name), qb.get(name)
        if a is None or b is None:
            rows.append((name, a, b, None, None))
            continue
        raw = b / a if a else float("inf")
        norm = (b / cb) / (a / ca) if (a and ca and cb) else None
        rows.append((name, a, b, raw, norm))
    return rows


def main(argv: list[str]) -> None:
    if len(argv) != 2:
        sys.exit(__doc__)
    old, new = _load(argv[0]), _load(argv[1])
    ca = old.get("control_1row_count_sec")
    cb = new.get("control_1row_count_sec")
    print(f"old: {argv[0]}  control={ca}s  headline={old.get('value')}s")
    print(f"new: {argv[1]}  control={cb}s  headline={new.get('value')}s")
    if ca and cb:
        print(f"box-state factor (new control / old control): {cb / ca:.2f}x")
    print(f"{'query':<34}{'old_s':>8}{'new_s':>8}{'raw':>7}{'norm':>7}")
    for name, a, b, raw, norm in compare(old, new):
        fa = f"{a:.3f}" if a is not None else "-"
        fb = f"{b:.3f}" if b is not None else "-"
        fr = f"{raw:.2f}x" if raw is not None else "-"
        fn = f"{norm:.2f}x" if norm is not None else "-"
        print(f"{name:<34}{fa:>8}{fb:>8}{fr:>7}{fn:>7}")
    sa, sb = old.get("sequences_per_sec"), new.get("sequences_per_sec")
    if sa and sb:
        print(f"headline sequences/sec: {sa} -> {sb} ({sb / sa:.2f}x raw)")
    pa = old.get("reference_parity_w144") or {}
    pb = new.get("reference_parity_w144") or {}
    wa, wb = pa.get("wall_sec"), pb.get("wall_sec")
    if wa and wb:
        # parity_normalized is in the artifact from r8 on; derive it for
        # older artifacts from their own control so the series is complete
        na = pa.get("parity_normalized") or (wa / ca if ca else None)
        nb = pb.get("parity_normalized") or (wb / cb if cb else None)
        raw = wb / wa
        line = f"reference_parity_w144: {wa}s -> {wb}s ({raw:.2f}x raw"
        if na and nb:
            line += f", {(nb / na):.2f}x control-normalized"
        print(line + ")")


if __name__ == "__main__":
    main(sys.argv[1:])
