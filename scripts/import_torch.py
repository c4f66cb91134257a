#!/usr/bin/env python
"""Migrate a reference PyTorch checkpoint into this framework.

Reads a checkpoint written by the reference trainer (``torch.save({...,
"model_state": model.state_dict()})`` — src/training/utils_train.py:38-56,
or a bare ``state_dict``), converts it with
:mod:`custom_yolo_tpu.utils.torch_port`, and writes an orbax checkpoint +
``transforms.json`` sidecar that ``Detector.load_weights`` /
``scripts/train.py --load_from_checkpoint`` / ``scripts/evaluate.py``
consume directly.

    python scripts/import_torch.py \
        --torch_checkpoint experiments/checkpoints/model_epoch_90 \
        --output experiments/imported/model_epoch_90 \
        --preset x --num_classes 172

The conversion is validated end-to-end in ``tests/test_torch_port.py``
against the live reference network (forward parity < 1e-3 relative).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="torch checkpoint migration")
    p.add_argument("--torch_checkpoint", required=True,
                   help="reference .pt/.pth file (trainer wrapper or bare "
                        "state_dict; DDP 'module.' prefixes handled)")
    p.add_argument("--output", required=True,
                   help="orbax checkpoint directory to write")
    p.add_argument("--preset", default=None,
                   help="model scale preset (n/s/m/l/x); or pass --config")
    p.add_argument("--config", default=None,
                   help="config.yaml carrying model width/depth/csp/"
                        "num_classes (preset wins if both given)")
    p.add_argument("--num_classes", type=int, default=None,
                   help="override class count (required with --preset)")
    p.add_argument("--fuse", action="store_true",
                   help="also fold conv+BN for serving before saving")
    args = p.parse_args()

    # conversion is pure host-side numpy/CPU work — no TPU needed
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from custom_yolo_tpu.models import Detector
    from custom_yolo_tpu.models.presets import PRESETS
    from custom_yolo_tpu.utils.torch_port import import_torch_weights

    input_size = (640, 640)
    if args.preset:
        arch = PRESETS[args.preset]
        if args.num_classes is None:
            p.error("--num_classes is required with --preset")
        num_classes = args.num_classes
        width, depth, csp = arch["width"], arch["depth"], arch["csp"]
    elif args.config:
        from custom_yolo_tpu.config import Config
        cfg = Config.from_yaml(args.config)
        width, depth, csp = cfg.model.width, cfg.model.depth, cfg.model.csp
        num_classes = (args.num_classes if args.num_classes is not None
                       else cfg.model.num_classes)
        input_size = tuple(cfg.model.input_size)
    else:
        p.error("pass --preset or --config")

    det = Detector(width, depth, csp, num_classes=num_classes,
                   input_size=input_size)
    import_torch_weights(det, args.torch_checkpoint)
    if args.fuse:
        det.fuse()
    det.save_weights(args.output)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        det.variables["params"]))
    print(f"imported {args.torch_checkpoint} -> {args.output} "
          f"({n_params / 1e6:.1f}M params, fused={args.fuse})")


if __name__ == "__main__":
    main()
