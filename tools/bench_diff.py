"""Diff per-query warm timings between bench runs (VERDICT r8 #4).

bench.py appends the FULL per-query map of every run to
BENCH_HISTORY.jsonl (the driver's one-line capture only fits ~64
entries). This tool compares two runs — by default the last two at the
same scale factor — and prints every query whose warm time moved more
than RATIO x and ABS seconds, normalized by the sql_probe calibration so
sandbox drift doesn't read as a code regression.

Usage:  python tools/bench_diff.py [--ratio 1.5] [--abs 0.2] [-n 0] [-m 1]
        (-n / -m: history indices from the end, default last vs previous)
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_history() -> list[dict]:
    path = os.path.join(REPO, "BENCH_HISTORY.jsonl")
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--abs", dest="abs_s", type=float, default=0.2)
    ap.add_argument("-n", type=int, default=0, help="newer run, index from end")
    ap.add_argument("-m", type=int, default=1, help="older run, index from end")
    args = ap.parse_args()

    hist = load_history()
    if len(hist) < 2:
        print("need at least two runs in BENCH_HISTORY.jsonl")
        return
    new = hist[-1 - args.n]
    olds = [
        h
        for h in hist[: len(hist) - 1 - args.n]
        if h.get("sf") == new.get("sf")
    ]
    old = olds[-args.m] if olds else hist[-1 - args.m]
    cal_new = new.get("calibration", {}).get("sql_probe") or 1.0
    cal_old = old.get("calibration", {}).get("sql_probe") or 1.0
    drift = cal_new / cal_old
    print(
        f"old={old.get('git_head', '?')} new={new.get('git_head', '?')} "
        f"sf={new.get('sf')} machine drift x{drift:.2f} "
        f"(sql_probe {cal_old} -> {cal_new})"
    )
    qn, qo = new["queries"], old["queries"]
    moved = []
    for name in sorted(set(qn) | set(qo)):
        a, b = qo.get(name), qn.get(name)
        if a is None:
            moved.append((float("inf"), name, a, b, "NEW"))
            continue
        if b is None:
            moved.append((float("inf"), name, a, b, "REMOVED"))
            continue
        b_norm = b / drift  # machine-normalized
        if a <= 0:
            continue
        r = b_norm / a
        if (r >= args.ratio or r <= 1 / args.ratio) and abs(b_norm - a) >= args.abs_s:
            moved.append((r, name, a, b, f"x{r:.2f} (raw {b}s)"))
    if not moved:
        print(
            f"no query moved past x{args.ratio} and {args.abs_s}s "
            f"(machine-normalized), {len(qn)} compared"
        )
        return
    for r, name, a, b, note in sorted(moved, key=lambda t: -t[0]):
        print(f"  {name}: {a} -> {b} s  {note}")


if __name__ == "__main__":
    main()
