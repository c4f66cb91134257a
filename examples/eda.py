#!/usr/bin/env python
"""Exploratory dataset analysis — script equivalent of the reference's
``notebooks/02_eda_visualization.ipynb``, reading the processed Parquet.

Produces every plot family the notebook does (cells 8-12), as files instead
of widget cells:

* ``class_distribution.png`` — per-supercategory class count bars (cell 8;
  one subplot per supercategory instead of the ipywidgets dropdown)
* ``box_stats.png`` — 2×2 width/height/area/aspect-ratio histograms in
  pixels (cell 9)
* ``spatial_heatmap.png`` — centroid 2-D histogram, y inverted to image
  coordinates (cell 10)
* ``samples.png`` — annotated image grid: denormalize-free (we draw on the
  raw JPEGs), boxes + class labels (cell 11)
* ``area_by_class.png`` — per-class box-area boxplots grouped by
  supercategory (cell 12)

Text summaries (counts, normalized box stats, COCO small/medium/large
split) always print; figures are written when ``--save_plots`` is given.
CI smoke coverage: ``tests/test_examples.py``.
"""

import argparse
import glob
import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def load_parquet(path: str) -> pd.DataFrame:
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        return pd.concat([pd.read_parquet(f) for f in files],
                         ignore_index=True)
    return pd.read_parquet(path)


def explode(df: pd.DataFrame) -> pd.DataFrame:
    """One row per ANNOTATION (the notebook's ``df_exploded``): bbox columns
    in pixels + name/supercategory + the owning image's size."""
    rows = []
    has_super = "supercategory" in df.columns
    for _, row in df.iterrows():
        supers = (row["supercategory"] if has_super
                  else ["all"] * len(row["bbox"]))
        for bbox, cid, name, sc in zip(row["bbox"], row["category_id"],
                                       row["name"], supers):
            x, y, w, h = (float(v) for v in bbox)
            rows.append({
                "category_id": int(cid), "name": str(name),
                "supercategory": str(sc),
                "x": x, "y": y, "width": w, "height": h,
                "area": w * h,
                "aspect_ratio": w / (h + 1e-6),
                "img_w": float(row["width"]), "img_h": float(row["height"]),
                "file_name": row["file_name"],
            })
    return pd.DataFrame(rows)


def text_summary(df: pd.DataFrame, boxes: pd.DataFrame, top_k: int) -> None:
    print(f"images: {len(df)}")
    print(f"annotations: {len(boxes)} "
          f"({len(boxes) / max(len(df), 1):.2f} per image)")
    counts = Counter(zip(boxes["category_id"], boxes["name"]))
    print(f"classes present: {len(counts)}")
    print(f"supercategories: {boxes['supercategory'].nunique()}")
    print(f"top {top_k} classes:")
    for (cid, name), count in counts.most_common(top_k):
        print(f"  {cid:4d} {name:<24s} {count}")

    wn = (boxes["width"] / boxes["img_w"]).to_numpy()
    hn = (boxes["height"] / boxes["img_h"]).to_numpy()
    print("box width  (norm): "
          f"mean={wn.mean():.3f} median={np.median(wn):.3f} "
          f"p95={np.percentile(wn, 95):.3f}")
    print("box height (norm): "
          f"mean={hn.mean():.3f} median={np.median(hn):.3f} "
          f"p95={np.percentile(hn, 95):.3f}")
    areas = wn * hn
    small = (areas < (32 / 640) ** 2).mean()
    large = (areas > (96 / 640) ** 2).mean()
    print(f"area split @640: small={small:.1%} "
          f"medium={1 - small - large:.1%} large={large:.1%}")
    print("aspect ratio: "
          f"median={boxes['aspect_ratio'].median():.2f} "
          f"p5={boxes['aspect_ratio'].quantile(0.05):.2f} "
          f"p95={boxes['aspect_ratio'].quantile(0.95):.2f}")


def plot_class_distribution(boxes, out, top_k):
    import matplotlib.pyplot as plt
    supers = sorted(boxes["supercategory"].unique())
    cols = min(3, len(supers))
    rows = math.ceil(len(supers) / cols)
    fig, axes = plt.subplots(rows, cols,
                             figsize=(6 * cols, 4.2 * rows), squeeze=False)
    for ax, sc in zip(axes.flat, supers):
        counts = (boxes[boxes["supercategory"] == sc]["name"]
                  .value_counts().head(top_k))
        ax.barh(counts.index[::-1], counts.values[::-1])
        ax.set_title(f"class distribution: {sc}")
        ax.set_xlabel("count")
    for ax in axes.flat[len(supers):]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    print(f"saved {out}")


def plot_box_stats(boxes, out):
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(2, 2, figsize=(14, 10))
    panels = [("width", "width (px)", None),
              ("height", "height (px)", None),
              ("area", "area (px²)", None),
              ("aspect_ratio", "aspect ratio (w/h)", (0, 5))]
    for ax, (col, label, xlim) in zip(axes.flat, panels):
        vals = boxes[col].to_numpy()
        if xlim:
            vals = vals[(vals >= xlim[0]) & (vals <= xlim[1])]
        ax.hist(vals, bins=50)
        ax.set_title(f"distribution of box {label}")
        ax.set_xlabel(label)
        if xlim:
            ax.set_xlim(*xlim)
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    print(f"saved {out}")


def plot_spatial_heatmap(boxes, out):
    import matplotlib.pyplot as plt
    cx = (boxes["x"] + boxes["width"] / 2).to_numpy()
    cy = (boxes["y"] + boxes["height"] / 2).to_numpy()
    fig, ax = plt.subplots(figsize=(8, 6.5))
    h = ax.hist2d(cx, cy, bins=[64, 64], cmap="inferno")
    fig.colorbar(h[3], ax=ax, label="number of objects")
    ax.set_title("object spatial distribution (centroid heatmap)")
    ax.set_xlabel("x (px)")
    ax.set_ylabel("y (px)")
    ax.invert_yaxis()   # image coordinates: origin top-left
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    print(f"saved {out}")


def plot_samples(df, images_dir, out, num_samples=6, seed=0):
    import matplotlib.pyplot as plt
    from PIL import Image
    rng = np.random.RandomState(seed)
    n = min(num_samples, len(df))
    idxs = rng.choice(len(df), size=n, replace=False)
    cols = min(3, n)
    rows = math.ceil(n / cols)
    fig, axes = plt.subplots(rows, cols,
                             figsize=(5 * cols, 5 * rows), squeeze=False)
    for ax, idx in zip(axes.flat, idxs):
        row = df.iloc[int(idx)]
        path = os.path.join(images_dir, row["file_name"])
        if not os.path.exists(path):
            ax.set_title(f"missing: {row['file_name']}")
            ax.axis("off")
            continue
        ax.imshow(np.asarray(Image.open(path).convert("RGB")))
        for bbox, name in zip(row["bbox"], row["name"]):
            x, y, w, h = (float(v) for v in bbox)
            ax.add_patch(plt.Rectangle((x, y), w, h, fill=False,
                                       color="red", linewidth=2))
            ax.text(x, y, str(name), color="white", fontsize=9,
                    backgroundcolor="red")
        ax.set_title(row["file_name"])
        ax.axis("off")
    for ax in axes.flat[n:]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    print(f"saved {out}")


def plot_area_by_class(boxes, out, top_k):
    import matplotlib.pyplot as plt
    supers = sorted(boxes["supercategory"].unique())
    cols = min(2, len(supers))
    rows = math.ceil(len(supers) / cols)
    fig, axes = plt.subplots(rows, cols,
                             figsize=(8 * cols, 5 * rows), squeeze=False)
    for ax, sc in zip(axes.flat, supers):
        sub = boxes[boxes["supercategory"] == sc]
        order = (sub.groupby("name")["area"].median()
                 .sort_values().index[:top_k])
        data = [sub[sub["name"] == n]["area"].to_numpy() for n in order]
        ax.boxplot(data, tick_labels=list(order))
        ax.set_title(f"box area distribution — {sc}")
        ax.set_ylabel("area (px²)")
        ax.tick_params(axis="x", rotation=45)
    for ax in axes.flat[len(supers):]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    print(f"saved {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--parquet", required=True,
                   help="processed parquet file or directory")
    p.add_argument("--images", default=None,
                   help="raw image directory (enables the annotated "
                        "sample grid)")
    p.add_argument("--save_plots", default=None,
                   help="directory for output figures (omit = text only)")
    p.add_argument("--top_k", type=int, default=20)
    args = p.parse_args()

    df = load_parquet(args.parquet)
    boxes = explode(df)
    text_summary(df, boxes, args.top_k)

    if args.save_plots:
        import matplotlib
        matplotlib.use("Agg")
        os.makedirs(args.save_plots, exist_ok=True)
        j = lambda name: os.path.join(args.save_plots, name)
        plot_class_distribution(boxes, j("class_distribution.png"),
                                args.top_k)
        plot_box_stats(boxes, j("box_stats.png"))
        plot_spatial_heatmap(boxes, j("spatial_heatmap.png"))
        plot_area_by_class(boxes, j("area_by_class.png"), args.top_k)
        if args.images:
            plot_samples(df, args.images, j("samples.png"))


if __name__ == "__main__":
    main()
