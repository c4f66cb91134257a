"""Data pipeline tests: RLE decode, streaming JSON, ETL → parquet → dataset
→ loader round trip on a synthetic tiny-COCO fixture (the reference's
``is_test`` smoke fixture formalized, SURVEY §4)."""

import json
import os

import numpy as np
import pytest


# ---------------------------------------------------------------- RLE
def _rle_encode_counts(mask_fortran_flat):
    """Straight RLE encode (uncompressed counts) for round-trip testing."""
    counts = []
    prev = 0
    run = 0
    for v in mask_fortran_flat:
        if v == prev:
            run += 1
        else:
            counts.append(run)
            prev = v
            run = 1
    counts.append(run)
    return counts


def _compress_counts(counts):
    """COCO rleToString (6-bit varint, delta from i-2 for i>2)."""
    out = []
    for i, x in enumerate(counts):
        if i > 2:
            x = x - counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            if c & 0x10:
                more = x != -1
            else:
                more = x != 0
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def test_rle_decode_uncompressed(rng):
    from custom_yolo_tpu.data.coco_rle import rle_decode
    mask = (rng.rand(13, 9) > 0.5).astype(np.uint8)
    counts = _rle_encode_counts(mask.T.flatten())
    got = rle_decode({"counts": counts, "size": [13, 9]})
    np.testing.assert_array_equal(got, mask)


def test_rle_decode_compressed(rng):
    from custom_yolo_tpu.data.coco_rle import rle_decode
    mask = (rng.rand(20, 15) > 0.7).astype(np.uint8)
    counts = _rle_encode_counts(mask.T.flatten())
    compressed = _compress_counts(counts)
    got = rle_decode({"counts": compressed, "size": [20, 15]})
    np.testing.assert_array_equal(got, mask)


def test_rle_to_polygons():
    from custom_yolo_tpu.data.coco_rle import rle_to_polygons
    mask = np.zeros((20, 20), np.uint8)
    mask[5:15, 5:15] = 1
    counts = _rle_encode_counts(mask.T.flatten())
    polys = rle_to_polygons({"counts": counts, "size": [20, 20]})
    assert len(polys) == 1
    assert len(polys[0]) >= 6  # at least 3 points


# ---------------------------------------------------------------- ETL
@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    """Synthetic COCO annotation JSON + images + parquet via the ETL."""
    from PIL import Image

    root = tmp_path_factory.mktemp("coco")
    ann_dir = root / "annotations"
    img_dir = root / "images"
    ann_dir.mkdir()
    img_dir.mkdir()

    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(6):
        w, h = int(rng.randint(80, 120)), int(rng.randint(80, 120))
        name = f"img_{i:03d}.jpg"
        Image.fromarray(
            (rng.rand(h, w, 3) * 255).astype(np.uint8)).save(img_dir / name)
        images.append({"id": i + 1, "file_name": name,
                       "height": h, "width": w})
        for a in range(int(rng.randint(1, 4))):
            bw, bh = float(rng.randint(10, 30)), float(rng.randint(10, 30))
            x = float(rng.randint(0, w - 31))
            y = float(rng.randint(0, h - 31))
            annotations.append({
                "id": len(annotations) + 1, "image_id": i + 1,
                "category_id": int(rng.choice([7, 11, 42])),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
                "segmentation": [[x, y, x + bw, y, x + bw, y + bh]],
            })
    categories = [{"id": 7, "name": "zebra", "supercategory": "animal"},
                  {"id": 11, "name": "apple", "supercategory": "food"},
                  {"id": 42, "name": "car", "supercategory": "vehicle"}]
    doc = {"info": {}, "images": images, "annotations": annotations,
           "categories": categories}
    with open(ann_dir / "instances_val2017.json", "w") as f:
        json.dump(doc, f)

    from custom_yolo_tpu.data.preprocess import DataPreprocess
    out_dir = root / "parquet"
    DataPreprocess.create_parquet_data(
        annotations_dir=str(ann_dir), output_dir=str(out_dir),
        output_folder="val", file_names=["instances_val2017.json"],
        keys=["images", "annotations", "categories"],
        columns=[["id", "file_name", "height", "width"],
                 ["id", "image_id", "category_id", "bbox", "area",
                  "iscrowd", "segmentation"],
                 ["id", "name", "supercategory"]],
        chunk_sizes=[100, 100, 100], is_test=False)
    return {"root": root, "ann_dir": ann_dir, "img_dir": img_dir,
            "parquet": out_dir / "val", "n_images": 6,
            "annotations": annotations}


def test_stream_json_items(tiny_coco):
    from custom_yolo_tpu.data.preprocess import stream_json_items
    items = list(stream_json_items(
        str(tiny_coco["ann_dir"] / "instances_val2017.json"), "images"))
    assert len(items) == tiny_coco["n_images"]
    assert items[0]["file_name"] == "img_000.jpg"


def test_etl_parquet_schema_and_category_reindex(tiny_coco):
    import pandas as pd
    df = pd.read_parquet(tiny_coco["parquet"])
    assert len(df) == tiny_coco["n_images"]
    for col in ["file_name", "height", "width", "id", "bbox",
                "category_id", "name", "old_category_id", "segmentation"]:
        assert col in df.columns
    # categories re-indexed by sorted name: apple=0, car=1, zebra=2
    name_to_new = {}
    for _, row in df.iterrows():
        for name, new_id in zip(row["name"], row["category_id"]):
            name_to_new[name] = new_id
    assert name_to_new == {"apple": 0, "car": 1, "zebra": 2}


def test_dataset_and_loader(tiny_coco):
    from custom_yolo_tpu.data.dataset import DetectionDataset
    from custom_yolo_tpu.data.loader import DataLoader

    ds = DetectionDataset(str(tiny_coco["parquet"]),
                          str(tiny_coco["img_dir"]),
                          input_size=(64, 64), max_gt=8)
    assert len(ds) == tiny_coco["n_images"]
    sample = ds[0]
    assert sample["image"].shape == (64, 64, 3)
    assert sample["image"].dtype == np.uint8
    assert sample["gt_boxes"].shape == (8, 4)
    k = int(sample["num_gt"])
    assert bool(sample["gt_mask"][:k].all())
    assert not bool(sample["gt_mask"][k:].any())
    # boxes are center-xywh within the resized canvas
    boxes = sample["gt_boxes"][:k]
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 0] <= 64).all()

    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                        num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2, 64, 64, 3)
    assert batches[0]["gt_boxes"].shape == (2, 8, 4)

    # deterministic reshuffle per epoch
    loader.set_epoch(0)
    first = [b["image_id"].tolist() for b in loader]
    loader.set_epoch(0)
    again = [b["image_id"].tolist() for b in loader]
    assert first == again
    loader.set_epoch(1)
    other = [b["image_id"].tolist() for b in loader]
    assert first != other


def test_loader_process_sharding(tiny_coco):
    from custom_yolo_tpu.data.dataset import DetectionDataset
    from custom_yolo_tpu.data.loader import DataLoader
    ds = DetectionDataset(str(tiny_coco["parquet"]),
                          str(tiny_coco["img_dir"]), input_size=(64, 64),
                          max_gt=8)
    seen = []
    for rank in range(2):
        loader = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False,
                            num_workers=1, process_index=rank,
                            process_count=2)
        for b in loader:
            seen.extend(b["image_id"].tolist())
    assert sorted(seen) == sorted(ds.image_ids.tolist())


def test_device_transforms():
    import jax
    import jax.numpy as jnp
    from custom_yolo_tpu.data.transforms import (
        batch_preprocess, make_device_batch)

    rng = np.random.RandomState(0)
    images = (rng.rand(4, 32, 32, 3) * 255).astype(np.uint8)
    boxes = (rng.rand(4, 8, 4) * 16 + 4).astype(np.float32)
    key = jax.random.key(0)

    # val path: deterministic normalize only
    x, b = batch_preprocess(jnp.asarray(images.copy()), jnp.asarray(boxes),
                            key, train=False)
    np.testing.assert_allclose(np.asarray(b), boxes)
    expected = (images.astype(np.float32) / 255.0
                - np.array([0.485, 0.456, 0.406])) / np.array(
                    [0.229, 0.224, 0.225])
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-5)

    # train path: output finite, boxes stay in canvas
    x, b = batch_preprocess(jnp.asarray(images.copy()), jnp.asarray(boxes),
                            key, train=True)
    assert bool(jnp.all(jnp.isfinite(x)))
    assert np.asarray(b)[..., 0].max() <= 32.0 + 1e-4

    host_batch = {"image": images, "gt_boxes": boxes,
                  "gt_labels": np.zeros((4, 8), np.int32),
                  "gt_mask": np.ones((4, 8), bool)}
    db = make_device_batch(host_batch, key, train=True)
    assert db["images"].shape == (4, 32, 32, 3)


def test_mosaic_compose_exact_geometry():
    """Deterministic mosaic core vs hand-computed placement: 4 constant-
    color 32² images, center crop (ox=oy=16) → each output quadrant is one
    source; each source's 20² centered box clips to a 10² corner box."""
    import jax.numpy as jnp
    from custom_yolo_tpu.data.transforms import mosaic_compose

    n, h, w, g = 4, 32, 32, 4
    colors = np.asarray([[0.1, 0.1, 0.1], [0.3, 0.3, 0.3],
                         [0.5, 0.5, 0.5], [0.9, 0.9, 0.9]], np.float32)
    images = np.broadcast_to(colors[:, None, None, :],
                             (n, h, w, 3)).copy()
    boxes = np.zeros((n, g, 4), np.float32)
    boxes[:, 0] = [16, 16, 20, 20]
    labels = np.broadcast_to(np.arange(n, dtype=np.int32)[:, None],
                             (n, g)).copy()
    mask = np.zeros((n, g), bool)
    mask[:, 0] = True

    src_idx = np.broadcast_to(np.arange(4), (n, 4)).copy()
    ox = np.full((n,), 16, np.int32)
    oy = np.full((n,), 16, np.int32)
    img, b, lab, m = mosaic_compose(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(mask), jnp.asarray(src_idx), jnp.asarray(ox),
        jnp.asarray(oy))
    img, b, lab, m = map(np.asarray, (img, b, lab, m))

    # pixels: window [16,48)² of the canvas → one source per quadrant
    full = np.empty((16, 16, 3), np.float32)
    for out_i in range(n):
        for quad, (ys, xs) in enumerate([(slice(0, 16), slice(0, 16)),
                                         (slice(0, 16), slice(16, 32)),
                                         (slice(16, 32), slice(0, 16)),
                                         (slice(16, 32), slice(16, 32))]):
            full[:] = colors[quad]
            np.testing.assert_allclose(img[out_i, ys, xs], full)
    # boxes: each source box (6,6)-(26,26) lands in its window corner,
    # clipped to 10²; valid-first stable order preserves source order
    expect = np.asarray([[5, 5, 10, 10], [27, 5, 10, 10],
                         [5, 27, 10, 10], [27, 27, 10, 10]], np.float32)
    assert m.all()
    np.testing.assert_allclose(b[0], expect)
    np.testing.assert_array_equal(lab[0], [0, 1, 2, 3])

    # zero-offset crop = pure source 0: the other three sources' boxes
    # clip to zero width and are dropped
    img0, b0, lab0, m0 = map(np.asarray, mosaic_compose(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(mask), jnp.asarray(src_idx),
        jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32)))
    np.testing.assert_allclose(img0[0], images[0])
    assert m0[0].sum() == 1
    np.testing.assert_allclose(b0[0, 0], [16, 16, 20, 20])
    assert lab0[0, 0] == 0
    # masked slots are zeroed
    np.testing.assert_allclose(b0[0, 1:], 0.0)


def test_mosaic_random_wrapper():
    import jax
    import jax.numpy as jnp
    from custom_yolo_tpu.data.transforms import make_device_batch, mosaic

    rng = np.random.RandomState(1)
    n, h, w, g = 8, 32, 32, 6
    images = rng.rand(n, h, w, 3).astype(np.float32)
    boxes = (rng.rand(n, g, 4) * 12 + 8).astype(np.float32)
    labels = rng.randint(0, 5, (n, g)).astype(np.int32)
    mask = rng.rand(n, g) > 0.3
    key = jax.random.key(7)

    # prob=0 → identity
    i0, b0, l0, m0 = mosaic(jnp.asarray(images), jnp.asarray(boxes),
                            jnp.asarray(labels), jnp.asarray(mask),
                            key, 0.0)
    np.testing.assert_allclose(np.asarray(i0), images)
    np.testing.assert_allclose(np.asarray(b0), boxes)

    # prob=1 → every kept box inside the window, labels from the source
    # label set, pixels are a rearrangement of source pixels
    i1, b1, l1, m1 = map(np.asarray, mosaic(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(mask), key, 1.0))
    kept = np.asarray(m1)
    bb = np.asarray(b1)
    x1 = bb[..., 0] - bb[..., 2] / 2
    x2 = bb[..., 0] + bb[..., 2] / 2
    assert (x1[kept] >= -1e-4).all() and (x2[kept] <= w + 1e-4).all()
    assert (bb[kept][:, 2:] > 2.0).all()
    assert np.isin(np.asarray(l1)[kept], labels).all()

    # full device-batch path with mosaic on
    host_batch = {"image": (images * 255).astype(np.uint8),
                  "gt_boxes": boxes, "gt_labels": labels, "gt_mask": mask}
    db = make_device_batch(host_batch, key, train=True, mosaic_prob=0.5)
    assert db["images"].shape == (n, h, w, 3)
    assert db["gt_boxes"].shape == (n, g, 4)
    assert bool(jnp.all(jnp.isfinite(db["images"])))


def test_mixup_compose_exact():
    """Deterministic mixup core: pixel blend at the given lambda, label
    union valid-first, truncation to the padded G slots."""
    import jax.numpy as jnp
    from custom_yolo_tpu.data.transforms import mixup_compose

    n, h, w, g = 2, 8, 8, 4
    images = np.stack([np.full((h, w, 3), 0.2, np.float32),
                       np.full((h, w, 3), 0.8, np.float32)])
    boxes = np.zeros((n, g, 4), np.float32)
    boxes[0, 0] = [2, 2, 2, 2]
    boxes[1, 0] = [6, 6, 2, 2]
    boxes[1, 1] = [4, 4, 2, 2]
    labels = np.asarray([[1, 0, 0, 0], [2, 3, 0, 0]], np.int32)
    mask = np.asarray([[1, 0, 0, 0], [1, 1, 0, 0]], bool)
    perm = np.asarray([1, 0])
    lam = np.asarray([0.25, 0.5], np.float32)

    img, b, lab, m = map(np.asarray, mixup_compose(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(mask), jnp.asarray(perm), jnp.asarray(lam)))
    # blend: 0.25·0.2 + 0.75·0.8 = 0.65; 0.5·0.8 + 0.5·0.2 = 0.5
    np.testing.assert_allclose(img[0], np.full((h, w, 3), 0.65), atol=1e-6)
    np.testing.assert_allclose(img[1], np.full((h, w, 3), 0.5), atol=1e-6)
    # union of labels, valid-first: out0 = own box + both of image 1's
    assert m[0].sum() == 3 and m[1].sum() == 3
    np.testing.assert_array_equal(lab[0][:3], [1, 2, 3])
    np.testing.assert_allclose(b[0][0], [2, 2, 2, 2])
    np.testing.assert_allclose(b[0][1], [6, 6, 2, 2])
    np.testing.assert_array_equal(lab[1][:3], [2, 3, 1])
    # masked slots zeroed
    np.testing.assert_allclose(b[0][3], 0.0)


def test_mixup_random_wrapper():
    import jax
    import jax.numpy as jnp
    from custom_yolo_tpu.data.transforms import make_device_batch, mixup

    rng = np.random.RandomState(2)
    n, h, w, g = 8, 16, 16, 5
    images = rng.rand(n, h, w, 3).astype(np.float32)
    boxes = (rng.rand(n, g, 4) * 6 + 4).astype(np.float32)
    labels = rng.randint(0, 5, (n, g)).astype(np.int32)
    mask = rng.rand(n, g) > 0.4
    key = jax.random.key(11)

    i0, b0, l0, m0 = mixup(jnp.asarray(images), jnp.asarray(boxes),
                           jnp.asarray(labels), jnp.asarray(mask), key, 0.0)
    np.testing.assert_allclose(np.asarray(i0), images)

    i1, b1, l1, m1 = map(np.asarray, mixup(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(mask), key, 1.0))
    # pixel range stays within the convex hull of the sources
    assert i1.min() >= images.min() - 1e-6
    assert i1.max() <= images.max() + 1e-6
    assert np.isin(l1[m1], labels).all()

    host_batch = {"image": (images * 255).astype(np.uint8),
                  "gt_boxes": boxes, "gt_labels": labels, "gt_mask": mask}
    db = make_device_batch(host_batch, key, train=True,
                           mosaic_prob=0.5, mixup_prob=0.3)
    assert db["images"].shape == (n, h, w, 3)
    assert bool(jnp.all(jnp.isfinite(db["images"])))


def test_letterbox_resize():
    import jax.numpy as jnp
    from custom_yolo_tpu.data.transforms import letterbox_resize

    img = jnp.ones((100, 200, 3), jnp.float32)
    out, scale, (pad_x, pad_y) = letterbox_resize(img, (64, 64))
    assert out.shape == (64, 64, 3)
    assert abs(scale - 0.32) < 1e-6
    assert pad_x == 0 and pad_y == 16
    # content rows are ~1.0, pad rows are the fill value
    assert abs(float(out[32, 32, 0]) - 1.0) < 1e-5
    assert abs(float(out[0, 0, 0]) - 114 / 255) < 1e-6


def test_model_summary(tiny_model):
    from custom_yolo_tpu.utils.summary import count_params, summarize
    _, variables = tiny_model
    text = summarize(variables)
    assert "total trainable" in text
    assert f"{count_params(variables):,}" in text


def test_etl_two_file_merge(tmp_path):
    """instances+stuff two-file ETL: categories from BOTH files re-index
    together by sorted name (reference merges instances_*.json +
    stuff_*.json, data_preprocessor.py:274-298)."""
    import json

    import pandas as pd
    from custom_yolo_tpu.data.preprocess import DataPreprocess

    ann = tmp_path / "ann"
    ann.mkdir()
    images = [{"id": 1, "file_name": "a.jpg", "height": 50, "width": 50}]
    inst = {"images": images,
            "annotations": [{"id": 1, "image_id": 1, "category_id": 5,
                             "bbox": [1, 1, 10, 10], "area": 100.0,
                             "iscrowd": 0, "segmentation": [[1, 1, 2, 2,
                                                             3, 3]]}],
            "categories": [{"id": 5, "name": "zebra",
                            "supercategory": "animal"}]}
    stuff = {"images": images,
             "annotations": [{"id": 2, "image_id": 1, "category_id": 93,
                              "bbox": [5, 5, 20, 20], "area": 400.0,
                              "iscrowd": 0, "segmentation": [[5, 5, 6, 6,
                                                              7, 7]]}],
             "categories": [{"id": 93, "name": "grass",
                             "supercategory": "stuff"}]}
    (ann / "instances_val2017.json").write_text(json.dumps(inst))
    (ann / "stuff_val2017.json").write_text(json.dumps(stuff))

    DataPreprocess.create_parquet_data(
        annotations_dir=str(ann), output_dir=str(tmp_path / "out"),
        output_folder="val",
        file_names=["instances_val2017.json", "stuff_val2017.json"],
        keys=["images", "annotations", "categories"],
        columns=[["id", "file_name", "height", "width"],
                 ["id", "image_id", "category_id", "bbox", "area",
                  "iscrowd", "segmentation"],
                 ["id", "name", "supercategory"]],
        chunk_sizes=[100, 100, 100], is_test=False)

    df = pd.read_parquet(tmp_path / "out" / "val")
    assert len(df) == 1
    row = df.iloc[0]
    got = dict(zip(row["name"], row["category_id"]))
    # sorted names: grass=0, zebra=1 (across both files)
    assert got == {"grass": 0, "zebra": 1}
    assert sorted(row["old_category_id"]) == [5, 93]
    assert len(row["bbox"]) == 2


# ---------------------------------------------------------------- letterbox
def test_dataset_letterbox_geometry(tiny_coco):
    """letterbox=True: aspect-preserving scale, 114-gray padding, and the
    emitted (scale, offset) invert GT boxes back to the parquet values."""
    from custom_yolo_tpu.data.dataset import DetectionDataset

    ds = DetectionDataset(str(tiny_coco["parquet"]),
                          str(tiny_coco["img_dir"]),
                          input_size=(64, 64), max_gt=8, letterbox=True)
    for idx in range(len(ds)):
        s = ds[idx]
        assert s["image"].shape == (64, 64, 3)
        scale, offset = s["scale"], s["offset"]
        assert scale[0] == scale[1] > 0
        ow, oh = (int(v) for v in s["orig_size"])
        assert scale[0] == pytest.approx(min(64 / ow, 64 / oh))
        # the shorter side is padded with gray 114
        nw, nh = int(round(ow * scale[0])), int(round(oh * scale[1]))
        if nh < 64:
            assert (s["image"][0] == 114).all()
        if nw < 64:
            assert (s["image"][:, 0] == 114).all()
        # inverse mapping recovers the original annotation boxes
        row = ds.df.iloc[idx]
        raw = np.asarray([list(b) for b in row["bbox"]], np.float32)
        k = int(s["num_gt"])
        b = s["gt_boxes"][:k]
        cx = (b[:, 0] - offset[0]) / scale[0]
        w = b[:, 2] / scale[0]
        np.testing.assert_allclose(cx, raw[:k, 0] + raw[:k, 2] / 2,
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(w, raw[:k, 2], rtol=1e-5, atol=1e-4)


def test_loader_stacks_geometry_keys(tiny_coco):
    from custom_yolo_tpu.data.dataset import DetectionDataset
    from custom_yolo_tpu.data.loader import DataLoader

    ds = DetectionDataset(str(tiny_coco["parquet"]),
                          str(tiny_coco["img_dir"]),
                          input_size=(64, 64), max_gt=8, letterbox=True)
    batch = next(iter(DataLoader(ds, batch_size=2, shuffle=False,
                                 drop_last=False, num_workers=1,
                                 use_native=False)))
    assert batch["scale"].shape == (2, 2)
    assert batch["offset"].shape == (2, 2)
    assert batch["orig_size"].shape == (2, 2)


def test_preprocess_image_letterbox_geometry():
    from custom_yolo_tpu.models.detector import (
        IMAGENET_MEAN, IMAGENET_STD, preprocess_image)

    img = np.full((50, 100, 3), 200, np.uint8)  # wide image
    arr, scale, offset = preprocess_image(img, (64, 64), letterbox=True,
                                          return_geometry=True)
    assert arr.shape == (1, 64, 64, 3)
    assert scale[0] == pytest.approx(0.64)
    assert offset[0] == 0 and offset[1] == (64 - 32) // 2
    # padding rows carry the normalized 114-gray value
    pad_px = arr[0, 0, 0]
    expect = (114.0 / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(pad_px, expect, atol=1e-5)
    # content rows carry the normalized 200-gray value
    content_px = arr[0, 32, 32]
    expect_c = (200.0 / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(content_px, expect_c, atol=1e-2)


# ---------------------------------------------------------------- ETL scale
def test_stream_json_items_tiny_buffer(tiny_coco):
    """Chunk boundaries mid-object: a 64-byte read buffer must still yield
    every annotation exactly once."""
    from custom_yolo_tpu.data.preprocess import stream_json_items
    path = str(tiny_coco["ann_dir"] / "instances_val2017.json")
    big = list(stream_json_items(path, "annotations"))
    small = list(stream_json_items(path, "annotations", buf_size=64))
    assert big == small
    assert len(big) == len(tiny_coco["annotations"])


def _write_synthetic_coco(path, n_images, anns_per_image):
    """Stream a large COCO JSON to disk without building it in memory."""
    import json as _json
    with open(path, "w") as f:
        f.write('{"info": {}, "images": [')
        for i in range(n_images):
            if i:
                f.write(",")
            f.write(_json.dumps({"id": i + 1, "file_name": f"i{i}.jpg",
                                 "height": 480, "width": 640}))
        f.write('], "annotations": [')
        k = 0
        for i in range(n_images):
            for a in range(anns_per_image):
                if k:
                    f.write(",")
                k += 1
                x, y = float(a * 3 % 600), float(a * 7 % 440)
                f.write(_json.dumps({
                    "id": k, "image_id": i + 1,
                    "category_id": 7 if a % 2 else 11,
                    "bbox": [x, y, 20.0, 15.0], "area": 300.0, "iscrowd": 0,
                    "segmentation": [[x, y, x + 20, y, x + 20, y + 15]]}))
        f.write('], "categories": ['
                '{"id": 7, "name": "zebra", "supercategory": "animal"},'
                '{"id": 11, "name": "apple", "supercategory": "food"}]}')
    return k


def test_etl_sharded_output_matches_single_shard(tmp_path):
    """Multi-shard spill path groups identically to the in-memory path."""
    import pandas as pd
    from custom_yolo_tpu.data.preprocess import DataPreprocess

    ann = tmp_path / "ann"
    ann.mkdir()
    _write_synthetic_coco(str(ann / "instances_val2017.json"), 50, 4)
    args = dict(
        annotations_dir=str(ann), output_folder="val",
        file_names=["instances_val2017.json"],
        keys=["images", "annotations", "categories"],
        columns=[["id", "file_name", "height", "width"],
                 ["id", "image_id", "category_id", "bbox", "area",
                  "iscrowd", "segmentation"],
                 ["id", "name", "supercategory"]],
        chunk_sizes=[100, 100, 100], is_test=False)
    DataPreprocess.create_parquet_data(
        output_dir=str(tmp_path / "one"), images_per_shard=1000, **args)
    DataPreprocess.create_parquet_data(
        output_dir=str(tmp_path / "many"), images_per_shard=13, **args)
    import glob
    one_files = glob.glob(str(tmp_path / "one" / "val" / "*.parquet"))
    many_files = glob.glob(str(tmp_path / "many" / "val" / "*.parquet"))
    assert len(one_files) == 1 and len(many_files) == 4  # ceil(50/13)
    a = pd.read_parquet(str(tmp_path / "one" / "val")).sort_values(
        "id", ignore_index=True)
    b = pd.read_parquet(str(tmp_path / "many" / "val")).sort_values(
        "id", ignore_index=True)
    assert len(a) == len(b) == 50
    pd.testing.assert_frame_equal(a, b)


def _vmhwm_mb_of(code: str) -> float:
    """Run ``code`` in a fresh interpreter and return its peak resident
    memory (VmHWM, MB). VmHWM is per-mm and reset by execve — unlike
    ru_maxrss, which lives in the task struct and survives fork+exec, so a
    child forked from a fat pytest parent (jax backend + models resident)
    would inherit the parent's peak and report ~900 MB before running a
    single line."""
    import subprocess
    import sys

    suffix = """
with open("/proc/self/status") as f:
    for line in f:
        if line.startswith("VmHWM"):
            print("VMHWM_KB", line.split()[1])
"""
    r = subprocess.run([sys.executable, "-c", code + suffix],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return float(r.stdout.split("VMHWM_KB")[1].strip()) / 1024


def test_etl_memory_bounded_at_scale(tmp_path):
    """~150k-annotation ETL in a subprocess: peak RSS stays bounded (the
    JSON is streamed and rows spill to disk shards) — VERDICT #6. Measured
    as VmHWM delta over a control interpreter that only does the imports,
    so the platform's baked interpreter footprint (sitecustomize pre-imports
    jax here) cancels out."""
    ann = tmp_path / "ann"
    ann.mkdir()
    n = _write_synthetic_coco(str(ann / "instances_val2017.json"),
                              30_000, 5)
    assert n == 150_000
    json_mb = os.path.getsize(ann / "instances_val2017.json") / 1e6
    imports = f"""
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
from custom_yolo_tpu.data.preprocess import DataPreprocess
import pandas, pyarrow, pyarrow.parquet
"""
    work = imports + f"""
DataPreprocess.create_parquet_data(
    annotations_dir={str(ann)!r}, output_dir={str(tmp_path / 'out')!r},
    output_folder="val", file_names=["instances_val2017.json"],
    keys=["images", "annotations", "categories"],
    columns=[["id", "file_name", "height", "width"],
             ["id", "image_id", "category_id", "bbox", "area",
              "iscrowd", "segmentation"],
             ["id", "name", "supercategory"]],
    chunk_sizes=[10000, 10000, 10000], is_test=False,
    images_per_shard=5000)
"""
    control_mb = _vmhwm_mb_of(imports)
    work_mb = _vmhwm_mb_of(work)
    delta_mb = work_mb - control_mb
    # One disk-spilled shard is 25k rows (~40 MB grouped + arrow buffers).
    # The pre-streaming implementation held the whole JSON text plus the
    # full merged frame — several hundred MB over the imports at this size
    # and O(dataset) beyond it.
    assert delta_mb < 120 + 2 * json_mb, (work_mb, control_mb, json_mb)
    import glob
    shards = glob.glob(str(tmp_path / "out" / "val" / "*.parquet"))
    assert len(shards) == 6  # ceil(30000/5000)
    import pandas as pd
    total = sum(len(pd.read_parquet(s)) for s in shards)
    assert total == 30_000
