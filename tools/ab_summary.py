"""Summarize same-seed training runs into one comparison table.

python tools/ab_summary.py name1=/path/metrics.jsonl name2=... \
    [--epochs 10,20,30,60]

Used for the sampler accuracy A/B (docs/RESULTS.md round 4): runs that
differ in one config knob, compared at common epochs plus each run's
final epoch.
"""

from __future__ import annotations

import argparse
import json


def load(path):
    out = {}
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            out[d["epoch"]] = d
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="name=path/metrics.jsonl")
    ap.add_argument("--epochs", default="5,10,20,30,60")
    args = ap.parse_args()
    runs = {}
    for spec in args.runs:
        name, path = spec.split("=", 1)
        runs[name] = load(path)
    probe = [int(e) for e in args.epochs.split(",")]
    names = list(runs)
    print("epoch | " + " | ".join(f"{n:>24}" for n in names))
    print("      | " + " | ".join(f"{'mIoU / allAcc':>24}" for _ in names))
    common = set.intersection(*(set(r) for r in runs.values()))
    for e in probe:
        if e not in common:
            continue
        cells = [f"{runs[n][e]['miou']:.4f} / {runs[n][e]['all_acc']:.4f}"
                 for n in names]
        print(f"{e:5d} | " + " | ".join(f"{c:>24}" for c in cells))
    last = max(common) if common else None
    if last is not None and last not in probe:
        cells = [f"{runs[n][last]['miou']:.4f} / "
                 f"{runs[n][last]['all_acc']:.4f}" for n in names]
        print(f"{last:5d} | " + " | ".join(f"{c:>24}" for c in cells)
              + "   (last common)")
    for n in names:
        e = max(runs[n])
        print(f"final {n}: epoch {e} mIoU {runs[n][e]['miou']:.4f} "
              f"allAcc {runs[n][e]['all_acc']:.4f}")


if __name__ == "__main__":
    main()
