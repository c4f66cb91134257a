#!/usr/bin/env python
"""Batch serving CLI: a directory of images → detections JSON.

The runnable form of docs/SERVING.md's deployment shape — the reference has
no batch-serving entry point (its surface is per-image
``Model.inference``, ``src/model/model_builder.py:79-139``; users write
their own loop). This composes the measured-fastest pipeline:

* native C++ JPEG decode on a producer thread (``--fast_decode`` adds
  JDCT_IFAST + DCT-domain prescale — serving-only approximate path),
* uint8 host→device transfer with on-device normalization
  (``Detector.serve(device_preprocess=True)``, 1 byte/px on the link),
* forward + DFL decode + NMS as ONE XLA program per batch,
* ``--inflight`` dispatched-but-unfetched batches to overlap host decode
  and device execution (and, here, the relay round trip).

Output: JSON list of {"image", "width", "height", "detections":
[[x1,y1,x2,y2,conf,cls], ...]} with boxes in ORIGINAL image pixels
(squash-resize inverse — the reference's val-transform convention,
``src/data/transforms.py:16-24``).

Example:
    python scripts/serve.py --images ./photos --checkpoint ckpt/ \
        --preset x --num_classes 172 --batch_size 64 --fast_decode \
        --output detections.json

(The minimal pedagogical version of this pipeline — plain loop, no
pipelining/int8/EMA handling — is ``examples/serve_folder.py``.)
"""

import argparse
import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--images", required=True,
                   help="directory of images (or a single image file)")
    p.add_argument("--output", default="detections.json")
    p.add_argument("--checkpoint", default=None,
                   help="Detector.save_weights dir (also what "
                        "import_torch.py writes), a model_epoch_N dir, or "
                        "a TrainState checkpoint root (needs --config)")
    p.add_argument("--config", default=None,
                   help="training config YAML — required only to restore "
                        "TrainState checkpoints (optimizer template) or to "
                        "derive the model shape instead of --preset")
    p.add_argument("--preset", default="x",
                   help="model preset (models/presets.py) when no --config")
    p.add_argument("--num_classes", type=int, default=172)
    p.add_argument("--input_size", type=int, default=640)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--top_k", type=int, default=1024)
    p.add_argument("--max_det", type=int, default=300)
    p.add_argument("--no_ema", action="store_true",
                   help="TrainState checkpoints: use live (not EMA) params")
    p.add_argument("--fast_decode", action="store_true",
                   help="serving decode path (±8 LSB; 2.3x at 640² sources)")
    p.add_argument("--host_preprocess", action="store_true",
                   help="normalize on host (fp32 on the link) instead of "
                        "shipping uint8 — only useful for A/B checks")
    p.add_argument("--inflight", type=int, default=2)
    p.add_argument("--decode_threads", type=int, default=0)
    p.add_argument("--quantize", default="none",
                   choices=["none", "static"],
                   help="static: selective int8 with scales calibrated on "
                        "the first --calib_batches input batches")
    p.add_argument("--calib_batches", type=int, default=4)
    return p.parse_args()


def build_detector(args):
    from custom_yolo_tpu.models import Detector
    from custom_yolo_tpu.models.presets import PRESETS

    if args.config:
        from custom_yolo_tpu.config import Config
        cfg = Config.from_yaml(args.config)
        width, depth, csp = cfg.model.width, cfg.model.depth, cfg.model.csp
        num_classes = cfg.model.num_classes
        input_size = tuple(cfg.model.input_size)
    else:
        cfg = None
        p = PRESETS[args.preset]
        width, depth, csp = p["width"], p["depth"], p["csp"]
        num_classes = args.num_classes
        input_size = (args.input_size, args.input_size)

    det = Detector(width, depth, csp, num_classes=num_classes,
                   input_size=input_size)

    ckpt_dir = args.checkpoint
    if ckpt_dir is None and cfg is not None:
        ckpt_dir = cfg.checkpoint.checkpoint_dir
    if ckpt_dir is None:
        print("[WARN] no --checkpoint: serving RANDOM init weights")
        det.init()
        return det, input_size

    # model_epoch_N handling mirrors scripts/evaluate.py: a specific epoch
    # dir is accepted directly; a root dir resolves to its latest epoch
    base = os.path.basename(os.path.normpath(ckpt_dir))
    root = (os.path.dirname(os.path.normpath(ckpt_dir))
            if base.startswith("model_epoch_") and base[12:].isdigit()
            else ckpt_dir)
    epoch_dir = ckpt_dir
    if root == ckpt_dir:  # a root: find latest model_epoch_N
        epochs = [int(d[12:]) for d in os.listdir(root)
                  if d.startswith("model_epoch_") and d[12:].isdigit()] \
            if os.path.isdir(root) else []
        if epochs:
            epoch_dir = os.path.join(root, f"model_epoch_{max(epochs)}")

    if os.path.exists(os.path.join(epoch_dir, "transforms.json")):
        det.load_weights(epoch_dir)
        print(f"[INFO] loaded Detector weights from {epoch_dir}")
        return det, input_size

    if cfg is None:
        raise SystemExit(
            f"[ERROR] {epoch_dir} is not a Detector.save_weights dir; "
            "restoring a TrainState checkpoint needs --config")
    import jax
    from custom_yolo_tpu.train.optim import build_optimizer
    from custom_yolo_tpu.train.train_state import TrainState
    from custom_yolo_tpu.utils.checkpoint import CheckpointManager

    det.init()
    tx = build_optimizer(cfg.training)
    template = jax.device_get(TrainState.create(
        det.variables, tx, jax.random.key(0),
        ema=cfg.training.ema_decay > 0))
    mgr = CheckpointManager(root)
    state = mgr.restore(template)
    det.variables = (state.variables if args.no_ema
                     else state.eval_variables)
    which = ("live" if args.no_ema or state.ema_params is None else "EMA")
    print(f"[INFO] restored epoch {int(state.epoch)} from {root} "
          f"({which} params)")
    return det, input_size


def main():
    args = parse_args()
    import numpy as np

    import jax

    from custom_yolo_tpu.runtime import NativeDecoder, native_available

    if os.path.isdir(args.images):
        paths = sorted(
            os.path.join(args.images, f) for f in os.listdir(args.images)
            if f.lower().endswith(IMG_EXTS))
    else:
        paths = [args.images]
    if not paths:
        raise SystemExit(f"[ERROR] no images under {args.images}")

    det, input_size = build_detector(args)
    det.fuse()
    H, W = input_size
    B = args.batch_size
    device_pre = not args.host_preprocess

    assert native_available(), "native decoder required (g++ -ljpeg build)"
    dec = NativeDecoder(args.decode_threads or (os.cpu_count() or 1))

    if args.quantize == "static":
        det.quantize(skip="auto")
        u8, _, _ = dec.decode_batch(paths[: args.calib_batches * B], H, W,
                                    fast=args.fast_decode)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        calib = (u8.astype(np.float32) / 255.0 - mean) / std
        det.calibrate([calib[i:i + B] for i in range(0, len(calib), B)])
        print(f"[INFO] selective int8, scales calibrated on "
              f"{args.calib_batches} batches")

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def host_pre(u8):
        return u8 if device_pre else (
            (u8.astype(np.float32) / 255.0 - mean) / std)

    def run_serve(x):
        return det.serve(x, conf_thres=args.conf, iou_thres=args.iou,
                         max_det=args.max_det, top_k=args.top_k,
                         device_preprocess=device_pre)

    # fixed-shape batches: pad the tail by repeating the last image (the
    # pad rows are dropped on fetch; recompiling a second program for the
    # tail shape would cost more than the wasted rows)
    batches = []
    for i in range(0, len(paths), B):
        chunk = paths[i:i + B]
        batches.append((chunk, chunk + [chunk[-1]] * (B - len(chunk))))

    q: "queue.Queue" = queue.Queue(maxsize=args.inflight + 1)

    def pil_decode(pth):
        # non-JPEG fallback (the native decoder is libjpeg): same contract
        # as decode_batch — squash-resize to (H, W), uint8, orig (w, h)
        from PIL import Image
        with Image.open(pth) as im:
            im = im.convert("RGB")
            w, h = im.size
            return np.asarray(im.resize((W, H), Image.BILINEAR),
                              dtype=np.uint8), (w, h)

    def producer():
        for chunk, padded in batches:
            jpeg = [p.lower().endswith((".jpg", ".jpeg")) for p in padded]
            if all(jpeg):
                u8, sizes, nf = dec.decode_batch(padded, H, W,
                                                 fast=args.fast_decode)
                if nf:
                    print(f"[WARN] {nf} images failed to decode in "
                          f"{chunk[0]}..", file=sys.stderr)
            else:
                u8 = np.zeros((len(padded), H, W, 3), np.uint8)
                sizes = np.zeros((len(padded), 2), np.int32)
                for i, pth in enumerate(padded):
                    u8[i], (sizes[i][0], sizes[i][1]) = pil_decode(pth)
            q.put((chunk, sizes, host_pre(u8)))
        q.put(None)

    results = []

    def fetch(item):
        chunk, sizes, res = item
        boxes = np.asarray(jax.device_get(res.boxes))
        scores = np.asarray(jax.device_get(res.scores))
        classes = np.asarray(jax.device_get(res.classes))
        nv = np.asarray(jax.device_get(res.num_valid))
        for j, path in enumerate(chunk):
            n = int(nv[j])
            w, h = int(sizes[j][0]), int(sizes[j][1])
            b = boxes[j, :n].astype(np.float64)
            b[:, [0, 2]] *= w / W   # squash-resize inverse → original px
            b[:, [1, 3]] *= h / H
            # clip to the image: DFL boxes are unbounded by design (up to
            # (reg_max-1)*stride past an edge anchor); drawn detections
            # should not leave the canvas
            b[:, [0, 2]] = b[:, [0, 2]].clip(0, w)
            b[:, [1, 3]] = b[:, [1, 3]].clip(0, h)
            results.append({
                "image": os.path.basename(path), "width": w, "height": h,
                "detections": [
                    [round(float(v), 2) for v in b[k]]
                    + [round(float(scores[j, k]), 4), int(classes[j, k])]
                    for k in range(n)],
            })

    t0 = time.perf_counter()
    threading.Thread(target=producer, daemon=True).start()
    inflight = []
    while True:
        item = q.get()
        if item is None:
            break
        chunk, sizes, x = item
        inflight.append((chunk, sizes, run_serve(jax.device_put(x))))
        if len(inflight) > args.inflight:
            fetch(inflight.pop(0))
    for item in inflight:
        fetch(item)
    dt = time.perf_counter() - t0

    with open(args.output, "w") as f:
        json.dump(results, f)
    n_det = sum(len(r["detections"]) for r in results)
    print(f"[INFO] {len(results)} images -> {n_det} detections in "
          f"{dt:.1f} s ({len(results) / dt:.1f} img/s incl. compile) "
          f"-> {args.output}")


if __name__ == "__main__":
    main()
