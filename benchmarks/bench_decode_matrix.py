#!/usr/bin/env python
"""Decode-rate matrix for the disk→detections feeding model.

Measures the native JPEG decoder (``runtime/src/decoder.cpp``) in img/s
per thread over {source resolution} × {exact, fast} — the numbers the
serving feeding model in docs/SERVING.md is built from:

    decode cores needed per chip ≈ chip_rate / decode_rate_per_core

``fast`` is the serving path (JDCT_IFAST + DCT-domain prescale toward the
640² resize target); it matters most when the source is larger than the
target (1280² → 640² skips 3/4 of the IDCT work in the prescale).

No TPU involved — pure host CPU. Run it on a quiet host: this container
has ONE core, so any concurrent producer thread halves every number.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_pipeline import make_jpeg_set  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--threads", type=int, default=0, help="0 = cpu_count")
    ap.add_argument("--root", default="/tmp/bench_pipeline_jpegs")
    args = ap.parse_args()

    from custom_yolo_tpu.runtime import NativeDecoder, native_available

    assert native_available(), "native decoder required"
    nthreads = args.threads or (os.cpu_count() or 1)
    dec = NativeDecoder(nthreads)

    rows = []
    for src in (640, 1280):
        tag = f"{args.root}_{src}_{args.n_images}"
        if not (os.path.isdir(tag)
                and len(os.listdir(tag)) >= args.n_images):
            make_jpeg_set(tag, args.n_images, src)
        paths = sorted(os.path.join(tag, f) for f in os.listdir(tag))
        for fast in (False, True):
            # warmup one batch (page cache, thread-pool spinup)
            dec.decode_batch(paths[: args.batch_size], 640, 640, fast=fast)
            t0 = time.perf_counter()
            done = 0
            for i in range(0, len(paths), args.batch_size):
                u8, _, nf = dec.decode_batch(
                    paths[i:i + args.batch_size], 640, 640, fast=fast)
                assert nf == 0
                done += u8.shape[0]
            dt = time.perf_counter() - t0
            rows.append({"src_size": src, "fast": fast,
                         "images": done, "threads": nthreads,
                         "img_per_s": round(done / dt, 1)})
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "decode_rate_matrix", "rows": rows}))


if __name__ == "__main__":
    main()
