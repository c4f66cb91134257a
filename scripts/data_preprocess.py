#!/usr/bin/env python
"""COCO JSON → Parquet ETL entry point — same CLI surface as the reference
``scripts/data_preprocess.py:11-45`` (``--mode train|val`` processes
instances_{mode}2017.json + stuff_{mode}2017.json)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from custom_yolo_tpu.config import Config
from custom_yolo_tpu.data.preprocess import DataPreprocess


def main():
    p = argparse.ArgumentParser(description="COCO → Parquet preprocessing")
    p.add_argument("--mode", required=True, choices=["train", "val"])
    p.add_argument("--config", default="configs/config.yaml")
    args = p.parse_args()

    cfg = Config.from_yaml(args.config)
    file_names = [f"instances_{args.mode}2017.json",
                  f"stuff_{args.mode}2017.json"]
    DataPreprocess.create_parquet_data(
        annotations_dir=cfg.data.annotations_dir,
        output_dir=cfg.data.processed_dir,
        output_folder=args.mode,
        file_names=file_names,
        keys=["images", "annotations", "categories"],
        columns=[["id", "file_name", "height", "width"],
                 ["id", "image_id", "category_id", "bbox", "area",
                  "iscrowd", "segmentation"],
                 ["id", "name", "supercategory"]],
        chunk_sizes=[10_000, 50_000, 1_000],
        is_test=cfg.data.is_test,
    )
    print(f"[INFO] wrote {args.mode} parquet to {cfg.data.processed_dir}")


if __name__ == "__main__":
    main()
