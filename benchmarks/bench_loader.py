#!/usr/bin/env python
"""BASELINE config #2: data-loader + on-device preprocessing throughput.

Measures (a) host decode+resize+pad batches/s for the PIL and native C++
backends and (b) the fused on-device flip/jitter/normalize step.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_fake_dataset(n_images: int, hw=(480, 640)):
    import numpy as np
    import pandas as pd
    from PIL import Image

    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    img_dir = os.path.join(tmp, "images")
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    rows = []
    base = (rng.rand(*hw, 3) * 255).astype(np.uint8)
    for i in range(n_images):
        name = f"img_{i:04d}.jpg"
        # shift the base image so JPEGs differ but encode cost is realistic
        Image.fromarray(np.roll(base, i * 7, axis=1)).save(
            os.path.join(img_dir, name), quality=90)
        k = int(rng.randint(1, 16))
        rows.append({
            "file_name": name, "height": hw[0], "width": hw[1], "id": i,
            "bbox": [[float(x) for x in rng.rand(4) * 100] for _ in range(k)],
            "category_id": [int(c) for c in rng.randint(0, 172, k)],
        })
    df = pd.DataFrame(rows)
    pq = os.path.join(tmp, "data.parquet")
    df.to_parquet(pq)
    return pq, img_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--skip_device", action="store_true",
                   help="host loader only (no TPU round-trip)")
    args = p.parse_args()

    import jax
    import numpy as np

    from custom_yolo_tpu.data.dataset import DetectionDataset
    from custom_yolo_tpu.data.loader import DataLoader
    from custom_yolo_tpu.data.transforms import make_device_batch
    from custom_yolo_tpu.runtime import native_available

    pq, img_dir = _make_fake_dataset(args.images)
    ds = DetectionDataset(pq, img_dir, input_size=(640, 640), max_gt=128)

    results = {}
    for backend, use_native in [("pil", False), ("native", True)]:
        if use_native and not native_available():
            continue
        loader = DataLoader(ds, args.batch_size, shuffle=False,
                            drop_last=True, num_workers=args.workers,
                            use_native=use_native)
        # warm one pass (page cache, pool thread_locals, allocator)
        for _ in loader:
            pass
        best = 0.0
        last = None
        for _ in range(2):  # best-of-2: single-CPU scheduler noise
            t0 = time.perf_counter()
            n = 0
            for batch in loader:
                n += batch["image"].shape[0]
                last = batch
            best = max(best, n / (time.perf_counter() - t0))
        results[f"loader_{backend}_img_s"] = round(best, 1)
        print(json.dumps({f"loader_{backend}_img_s": results[
            f"loader_{backend}_img_s"]}), flush=True)

    if args.skip_device:
        print(json.dumps({"metric": "input_pipeline_throughput",
                          "unit": "images/sec", **results}))
        return

    # on-device preprocess
    key = jax.random.key(0)
    db = make_device_batch(last, key, train=True)
    jax.block_until_ready(db["images"])
    t0 = time.perf_counter()
    for i in range(20):
        db = make_device_batch(last, jax.random.fold_in(key, i), train=True)
    jax.block_until_ready(db["images"])
    dt = time.perf_counter() - t0
    results["device_preprocess_img_s"] = round(
        20 * args.batch_size / dt, 1)

    print(json.dumps({
        "metric": "input_pipeline_throughput",
        "unit": "images/sec",
        **results,
    }))


if __name__ == "__main__":
    main()
