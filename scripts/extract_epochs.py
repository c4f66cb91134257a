#!/usr/bin/env python
"""Extract per-epoch metrics from a trainer console log into JSON.

Produces the same row shape as ``docs/results/ref_parity_r5_epochs.json``
(the live-reference retrain trajectory) so the two sides of the
quality-parity head-to-head can be overlaid directly
(docs/QUALITY_PARITY.md, VERDICT r4 task 1c).

    python scripts/extract_epochs.py --log /tmp/r5_matched_s0.log \
        --note "ours, matched recipe seed 0" \
        --out docs/results/ours_matched_s0_epochs.json
"""

import argparse
import json
import re

LINE = re.compile(
    r"epoch (\d+): train_loss=([\d.]+) val_loss=([\d.]+) "
    r"P=([\d.]+) R=([\d.]+) mAP=([\d.]+) lr=([\d.eE+-]+)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log", required=True)
    p.add_argument("--note", default="")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    rows = []
    with open(args.log) as f:
        for line in f:
            m = LINE.search(line)
            if m:
                rows.append({
                    "epoch": int(m.group(1)) + 1,  # trainer logs 0-based
                    "train_loss": float(m.group(2)),
                    "val_loss": float(m.group(3)),
                    "precision": float(m.group(4)),
                    "recall": float(m.group(5)),
                    "mAP": float(m.group(6)),
                    "lr": float(m.group(7)),
                })
    if not rows:
        raise SystemExit(f"[ERROR] no epoch lines found in {args.log}")
    with open(args.out, "w") as f:
        json.dump({"note": args.note, "rows": rows}, f, indent=1)
    print(f"[INFO] wrote {len(rows)} epochs to {args.out}")


if __name__ == "__main__":
    main()
