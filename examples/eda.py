#!/usr/bin/env python
"""Exploratory dataset analysis — script equivalent of the reference's
``notebooks/02_eda.ipynb`` (class distributions, box statistics, spatial
heatmap), reading the processed Parquet."""

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--parquet", required=True,
                   help="processed parquet file or directory")
    p.add_argument("--save_plots", default=None,
                   help="directory for output figures (omit = text only)")
    p.add_argument("--top_k", type=int, default=20)
    args = p.parse_args()

    if os.path.isdir(args.parquet):
        import glob
        files = sorted(glob.glob(os.path.join(args.parquet, "*.parquet")))
        df = pd.concat([pd.read_parquet(f) for f in files],
                       ignore_index=True)
    else:
        df = pd.read_parquet(args.parquet)

    print(f"images: {len(df)}")
    n_ann = int(df["category_id"].map(len).sum())
    print(f"annotations: {n_ann} "
          f"({n_ann / max(len(df), 1):.2f} per image)")

    # class distribution
    counts = Counter()
    names = {}
    for cids, cnames in zip(df["category_id"], df["name"]):
        for cid, name in zip(cids, cnames):
            counts[int(cid)] += 1
            names[int(cid)] = name
    print(f"classes present: {len(counts)}")
    print(f"top {args.top_k} classes:")
    for cid, count in counts.most_common(args.top_k):
        print(f"  {cid:4d} {names[cid]:<24s} {count}")

    # box stats (normalized by image size)
    widths, heights, cxs, cys = [], [], [], []
    for _, row in df.iterrows():
        img_w, img_h = row["width"], row["height"]
        for bbox in row["bbox"]:
            x, y, w, h = bbox
            widths.append(w / img_w)
            heights.append(h / img_h)
            cxs.append((x + w / 2) / img_w)
            cys.append((y + h / 2) / img_h)
    widths, heights = np.asarray(widths), np.asarray(heights)
    print("box width  (norm): "
          f"mean={widths.mean():.3f} median={np.median(widths):.3f} "
          f"p95={np.percentile(widths, 95):.3f}")
    print("box height (norm): "
          f"mean={heights.mean():.3f} median={np.median(heights):.3f} "
          f"p95={np.percentile(heights, 95):.3f}")
    areas = widths * heights
    small = (areas < (32 / 640) ** 2).mean()
    large = (areas > (96 / 640) ** 2).mean()
    print(f"area split @640: small={small:.1%} "
          f"medium={1 - small - large:.1%} large={large:.1%}")

    if args.save_plots:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(args.save_plots, exist_ok=True)
        fig, axes = plt.subplots(1, 3, figsize=(18, 5))
        top = counts.most_common(args.top_k)
        axes[0].barh([names[c] for c, _ in top][::-1],
                     [n for _, n in top][::-1])
        axes[0].set_title("class distribution (top)")
        axes[1].hist2d(widths, heights, bins=50)
        axes[1].set_xlabel("w/W")
        axes[1].set_ylabel("h/H")
        axes[1].set_title("box size")
        axes[2].hist2d(np.asarray(cxs), np.asarray(cys), bins=50)
        axes[2].set_title("center spatial heatmap")
        fig.tight_layout()
        out = os.path.join(args.save_plots, "eda.png")
        fig.savefig(out, dpi=120)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
