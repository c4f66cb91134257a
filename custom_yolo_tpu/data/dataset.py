"""Parquet-backed detection dataset.

Equivalent of the reference ``DetectionDataset``
(``src/data/dataset_loader.py:14-80``) with TPU-first output contract:
fixed-shape padded targets instead of ragged python lists (jit needs static
shapes — SURVEY §7 "hard parts"). Differences from the reference,
deliberate:

* images are decoded + squash-resized to the model input size on the host
  (the reference's torchvision Resize is host-side too, transforms.py:9);
  photometric augmentation + normalization run **on device**
  (``transforms.batch_preprocess``) so the host does uint8 work only;
* boxes are converted top-left-XYWH (COCO parquet) → **center-xywh** here,
  fixing the reference's convention mismatch (its loss treats them as
  centers while the dataset keeps top-left — SURVEY §7 quirk #2);
* ``percent`` subsampling is seeded (the reference's unseeded per-process
  ``df.sample`` desyncs ranks — quirk #7).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np
import pandas as pd


class DetectionDataset:
    def __init__(self, parquet_path: str, image_dir: str,
                 input_size: Tuple[int, int] = (640, 640),
                 is_test: bool = False, percent: float = 1.0,
                 max_gt: int = 128, seed: int = 42,
                 letterbox: bool = False):
        if os.path.isdir(parquet_path):
            import glob
            files = sorted(glob.glob(os.path.join(parquet_path, "*.parquet")))
            self.df = pd.concat([pd.read_parquet(f) for f in files],
                                ignore_index=True)
        else:
            self.df = pd.read_parquet(parquet_path)
        if percent < 1.0:
            self.df = self.df.sample(frac=percent, random_state=seed)
        if is_test:
            self.df = self.df.head(20)  # reference fixture size
                                        # (dataset_loader.py:34-36)
        self.df = self.df.reset_index(drop=True)
        self.image_dir = image_dir
        self.input_size = tuple(input_size)
        self.max_gt = max_gt
        # aspect-preserving resize + 114-gray padding instead of the
        # reference's squash resize (its transforms.py:9); boxes map as
        # model = orig * scale + offset
        self.letterbox = letterbox

    def _geometry(self, orig_w: int, orig_h: int):
        """Per-image mapping model = orig * (sx, sy) + (dx, dy)."""
        th, tw = self.input_size
        if self.letterbox:
            s = min(th / max(orig_h, 1), tw / max(orig_w, 1))
            nw, nh = int(round(orig_w * s)), int(round(orig_h * s))
            dx, dy = (tw - nw) // 2, (th - nh) // 2
            return (s, s), (float(dx), float(dy)), (nw, nh)
        sx = tw / max(orig_w, 1)
        sy = th / max(orig_h, 1)
        return (sx, sy), (0.0, 0.0), (tw, th)

    def _pack_targets(self, row, scale, offset):
        (sx, sy), (dx, dy) = scale, offset
        bboxes = np.asarray([list(b) for b in row["bbox"]],
                            dtype=np.float32).reshape(-1, 4)
        labels = np.asarray(list(row["category_id"]), dtype=np.int32)
        # COCO top-left XYWH → center-xywh in model-input pixels
        cx = (bboxes[:, 0] + bboxes[:, 2] / 2) * sx + dx
        cy = (bboxes[:, 1] + bboxes[:, 3] / 2) * sy + dy
        w = bboxes[:, 2] * sx
        h = bboxes[:, 3] * sy
        boxes = np.stack([cx, cy, w, h], axis=1)
        k = min(len(boxes), self.max_gt)
        gt_boxes = np.zeros((self.max_gt, 4), np.float32)
        gt_labels = np.zeros((self.max_gt,), np.int32)
        gt_mask = np.zeros((self.max_gt,), bool)
        gt_boxes[:k] = boxes[:k]
        gt_labels[:k] = labels[:k]
        gt_mask[:k] = True
        return gt_boxes, gt_labels, gt_mask, k

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        from PIL import Image

        row = self.df.iloc[idx]
        path = os.path.join(self.image_dir, row["file_name"])
        with Image.open(path) as img:
            img = img.convert("RGB")
            orig_w, orig_h = img.size
            scale, offset, (nw, nh) = self._geometry(orig_w, orig_h)
            img = img.resize((nw, nh), Image.Resampling.BILINEAR)
            if self.letterbox:
                th, tw = self.input_size
                image = np.full((th, tw, 3), 114, np.uint8)
                dx, dy = int(offset[0]), int(offset[1])
                image[dy:dy + nh, dx:dx + nw] = np.asarray(img, np.uint8)
            else:
                image = np.asarray(img, dtype=np.uint8)

        gt_boxes, gt_labels, gt_mask, k = self._pack_targets(
            row, scale, offset)

        return {
            "image": image,                      # (H, W, 3) uint8
            "gt_boxes": gt_boxes,                # (max_gt, 4) center-xywh px
            "gt_labels": gt_labels,              # (max_gt,)
            "gt_mask": gt_mask,                  # (max_gt,)
            "image_id": np.int64(row["id"]),
            "num_gt": np.int32(k),
            # inverse geometry for original-coordinate eval:
            # orig = (model - offset) / scale
            "scale": np.asarray(scale, np.float32),    # (2,) sx, sy
            "offset": np.asarray(offset, np.float32),  # (2,) dx, dy
            "orig_size": np.asarray([orig_w, orig_h], np.int32),
        }

    @property
    def image_ids(self) -> np.ndarray:
        return self.df["id"].to_numpy()

    # ---------------------------------------------------------------- native
    def image_path(self, idx: int) -> str:
        return os.path.join(self.image_dir, self.df.iloc[idx]["file_name"])

    def annotations(self, idx: int, orig_w: int, orig_h: int
                    ) -> Dict[str, np.ndarray]:
        """GT-only sample (image decoded elsewhere, e.g. by the native C++
        engine): pad + convert boxes exactly like ``__getitem__``."""
        row = self.df.iloc[idx]
        scale, offset, _ = self._geometry(orig_w, orig_h)
        gt_boxes, gt_labels, gt_mask, k = self._pack_targets(
            row, scale, offset)
        return {"gt_boxes": gt_boxes, "gt_labels": gt_labels,
                "gt_mask": gt_mask, "image_id": np.int64(row["id"]),
                "num_gt": np.int32(k),
                "scale": np.asarray(scale, np.float32),
                "offset": np.asarray(offset, np.float32),
                "orig_size": np.asarray([orig_w, orig_h], np.int32)}
