#!/usr/bin/env python
"""Digest round-5 checkpoint/threshold sweeps into comparison tables.

Inputs are ``scripts/sweep_eval.py`` output JSONs (epoch -> threshold ->
metrics).  Produces, per run: the self-selected point (final epoch at the
reference's fixed conf=0.25, ``src/training/metrics.py:159-191``), the
best-COCO point, the best-greedy point, and the best-F1 point — so both
sides of the quality-parity head-to-head can be compared at *their own*
best operating points (VERDICT r4 tasks 1a and 3).

    python scripts/r5_report.py ref=docs/results/ref_sweep_r5.json \
        matched_s0=/tmp/r5_sweep_matched_s0.json \
        quality_s0=/tmp/r5_sweep_quality_s0.json
"""

import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def fmt(name, ep, th, m):
    return (f"{name:<16} e{ep:>3}@{th:<5} P={m['precision']:.3f} "
            f"R={m['recall']:.3f} F1={m['f1_score']:.3f} "
            f"greedy={m['mAP']:.4f} coco={m['mAP_50_95']:.4f} "
            f"coco50={m['mAP_50']:.4f}")


def best(d, key):
    return max(((ep, th, m) for ep, ths in d.items() for th, m in ths.items()),
               key=lambda x: x[2][key])


def report(name, d):
    eps = sorted(d, key=int)
    final = eps[-1]
    rows = []
    th_final = "0.25" if "0.25" in d[final] else sorted(d[final])[0]
    rows.append(("self(final@0.25)",) + (final, th_final, d[final][th_final]))
    for label, key in (("best-COCO", "mAP_50_95"), ("best-greedy", "mAP"),
                       ("best-F1", "f1_score")):
        ep, th, m = best(d, key)
        rows.append((label, ep, th, m))
    print(f"== {name}")
    for label, ep, th, m in rows:
        print("  " + fmt(label, ep, th, m))
    return {label: (ep, th, m) for label, ep, th, m in rows}


def main():
    runs = {}
    for arg in sys.argv[1:]:
        name, path = arg.split("=", 1)
        runs[name] = report(name, load(path))
    # seed-spread summary over runs sharing a prefix (e.g. matched_s0/s1/s2)
    from collections import defaultdict
    groups = defaultdict(list)
    for name, r in runs.items():
        if "_s" in name and name.rsplit("_s", 1)[1].isdigit():
            groups[name.rsplit("_s", 1)[0]].append(r)
    for g, rs in groups.items():
        if len(rs) < 2:
            continue
        print(f"== seed spread: {g} ({len(rs)} seeds)")
        for label in ("self(final@0.25)", "best-COCO", "best-greedy"):
            for key in ("mAP_50_95", "mAP"):
                vals = [r[label][2][key] for r in rs]
                mean = sum(vals) / len(vals)
                print(f"  {label:<16} {key:<9} mean={mean:.4f} "
                      f"min={min(vals):.4f} max={max(vals):.4f} "
                      f"range={max(vals) - min(vals):.4f}")


if __name__ == "__main__":
    main()
