"""Offline ETL: COCO annotation JSON → image-grouped Parquet.

Behavioral equivalent of the reference ``DataPreprocess``
(``src/data/data_preprocessor.py``), producing byte-compatible Parquet
(same columns, same pyarrow schema :322-335, same snappy compression and
``{folder}-{i}.parquet`` naming :341-342) so datasets prepared by either
framework are interchangeable. Differences are implementation-only:

* streaming JSON via an incremental ``raw_decode`` cursor (stdlib) instead
  of ijson; chunked pandas instead of Dask (the groupby fits host memory —
  COCO-2017 is ~120k rows grouped);
* RLE→polygon via the pure-numpy decoder in ``coco_rle`` + cv2 contours
  instead of pycocotools (:193).

Semantics preserved: category re-indexing = dedupe, sort by name, positional
index becomes the training category id (:119-122 + :296-298); is_test stops
after item 500 (:100-102); iscrowd RLEs keep raw counts (:191-192); rows
merged images⋈annotations⋈categories then grouped per image (:307-318).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterator, List, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from custom_yolo_tpu.data.coco_rle import rle_to_polygons

PARQUET_SCHEMA = pa.schema([
    ("file_name", pa.string()),
    ("height", pa.int64()),
    ("width", pa.int64()),
    ("id", pa.int64()),
    ("segmentation", pa.list_(pa.list_(pa.list_(pa.float64())))),
    ("area", pa.list_(pa.float64())),
    ("iscrowd", pa.list_(pa.int64())),
    ("bbox", pa.list_(pa.list_(pa.float64()))),
    ("category_id", pa.list_(pa.int64())),
    ("supercategory", pa.list_(pa.string())),
    ("old_category_id", pa.list_(pa.int64())),
    ("name", pa.list_(pa.string())),
])


def stream_json_items(path: str, key: str,
                      is_test: bool = False,
                      test_limit: int = 500) -> Iterator[Dict[str, Any]]:
    """Yield items of the top-level array ``key`` from a (possibly huge)
    JSON file without parsing the whole document: locate ``"key": [`` and
    raw_decode one element at a time."""
    with open(path, "r") as f:
        text = f.read()
    probe = f'"{key}"'
    start = text.find(probe)
    if start < 0:
        return
    bracket = text.index("[", start)
    decoder = json.JSONDecoder()
    pos = bracket + 1
    count = 0
    n = len(text)
    while pos < n:
        while pos < n and text[pos] in " \t\r\n,":
            pos += 1
        if pos >= n or text[pos] == "]":
            return
        obj, pos = decoder.raw_decode(text, pos)
        yield obj
        count += 1
        if is_test and count > test_limit:
            return


class DataPreprocess:
    """Same constructor surface as the reference
    (data_preprocessor.py:14-43)."""

    def __init__(self, annotations_dir: str, output_dir: str,
                 is_test: bool = False):
        self.input_dir = annotations_dir
        self.output_dir = output_dir
        self.is_test = is_test

    def load_annotations_file(self, file_names: List[str], key: str,
                              columns: Optional[List[str]] = None,
                              chunk_size: int = 10_000) -> pd.DataFrame:
        """Stream `key` items from each file into one DataFrame, with the
        reference's post-processing per key (:109-124): images dedupe;
        categories dedupe + sort-by-name + positional reindex."""
        chunks: List[pd.DataFrame] = []
        for file in file_names:
            current: List[Dict[str, Any]] = []
            for obj in stream_json_items(os.path.join(self.input_dir, file),
                                         key, is_test=self.is_test):
                current.append(obj)
                if len(current) >= chunk_size:
                    chunks.append(pd.DataFrame(current, columns=columns))
                    current = []
            if current:
                chunks.append(pd.DataFrame(current, columns=columns))
        if not chunks:
            return pd.DataFrame(columns=columns)
        df = pd.concat(chunks, ignore_index=True)
        if key == "images":
            return df.drop_duplicates()
        if key == "categories":
            return (df.drop_duplicates()
                      .sort_values(by=["name"], ignore_index=True)
                      .reset_index())
        return df

    def _polygons_row(self, seg, iscrowd):
        if isinstance(seg, dict) and "counts" in seg:
            if iscrowd == 1:
                return [seg["counts"]]
            return rle_to_polygons(seg)
        return seg

    @staticmethod
    def create_parquet_data(annotations_dir: str, output_dir: str,
                            output_folder: str, file_names: List[str],
                            keys: List[str], columns: List[List[str]],
                            chunk_sizes: List[int], is_test: bool) -> None:
        """Same call surface as the reference static entry point
        (data_preprocessor.py:236-344)."""
        pp = DataPreprocess(annotations_dir, output_dir, is_test=is_test)
        images = pp.load_annotations_file(file_names, keys[0], columns[0],
                                          chunk_sizes[0])
        annots = pp.load_annotations_file(file_names, keys[1], columns[1],
                                          chunk_sizes[1])
        categos = pp.load_annotations_file(file_names, keys[2], columns[2],
                                           chunk_sizes[2])

        merged = (images.merge(annots, how="inner", left_on="id",
                               right_on="image_id",
                               suffixes=("_image", "_annots"))
                        .merge(categos, how="inner", left_on="category_id",
                               right_on="id",
                               suffixes=("_combined", "categos"))
                        .rename(columns={"id": "old_category_id",
                                         "category_id": "stale_category_id",
                                         "index": "category_id",
                                         "id_image": "id"}))

        merged["segmentation"] = [
            pp._polygons_row(seg, crowd)
            for seg, crowd in zip(merged["segmentation"], merged["iscrowd"])]

        merged = merged.drop(columns=["image_id", "stale_category_id",
                                      "id_annots"], errors="ignore")

        agg = {"segmentation": list, "area": list, "iscrowd": list,
               "bbox": list, "category_id": list, "supercategory": list,
               "old_category_id": list, "name": list}
        grouped = (merged.groupby(by=["file_name", "height", "width", "id"])
                         .agg(agg).reset_index())

        # iscrowd RLE counts break the (float-polygon) schema; replace crowd
        # segmentations with empty polygon lists in the parquet (the
        # detection pipeline never consumes them)
        def _schema_safe(segs, crowds):
            return [s if not c else [] for s, c in zip(segs, crowds)]
        grouped["segmentation"] = [
            _schema_safe(s, c)
            for s, c in zip(grouped["segmentation"], grouped["iscrowd"])]

        path = os.path.join(output_dir, output_folder)
        os.makedirs(path, exist_ok=True)
        table = pa.Table.from_pandas(grouped[PARQUET_SCHEMA.names],
                                     schema=PARQUET_SCHEMA,
                                     preserve_index=False)
        pq.write_table(table, os.path.join(
            path, f"{output_folder}-0.parquet"), compression="snappy")

    @staticmethod
    def category_mapping(annotations_dir: str, file_names: List[str]
                         ) -> pd.DataFrame:
        """Training-id ↔ COCO-id/name table (sorted-by-name reindex)."""
        pp = DataPreprocess(annotations_dir, ".", is_test=False)
        cats = pp.load_annotations_file(file_names, "categories")
        return cats.rename(columns={"index": "category_id",
                                    "id": "coco_id"})
