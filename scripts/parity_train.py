#!/usr/bin/env python
"""Head-to-head quality parity: train the LIVE reference on our fixture.

Drives the reference's actual training stack unmodified — its ``Model``
(src/model/model_builder.py:13-50), ``YoloDFLQFLoss`` (src/model/losses.py:84),
``get_optimizer`` (src/training/utils_train.py:20-36) and the full epoch
engine ``train()`` (src/training/train_model.py:145-384) — on the synthetic
fixture produced by ``scripts/make_fixture.py`` + our byte-compatible ETL
parquet. CPU-only (the torch build here has no accelerator).

The ONLY shimmed piece is the data path: torchvision is not installed in
this environment (the reference's own tests stub it the same way —
tests/test_torch_port.py:42), so ``ParityDataset``/``ShimTransforms`` below
replicate the reference pipeline faithfully:

* ``DetectionDataset.__getitem__`` semantics (src/data/dataset_loader.py:43-80):
  PIL open → XYWH (top-left) boxes → transforms → ``target['boxes'] =
  cat(boxes, labels)`` — boxes stay top-left XYWH, preserving SURVEY quirk #2
  (the loss then treats them as center-xywh; that mismatch is part of what
  this experiment measures).
* ``get_train_transforms`` (src/data/transforms.py:4-14): ToImage →
  RandomHorizontalFlip(0.5, box-aware) → Resize (640,640) squash (bilinear,
  matching the v2 default) → ColorJitter(0.2,0.2,0.2,0.1) (standard
  brightness/contrast/saturation blend + HSV hue shift, random order like
  torchvision) → scale to [0,1] → ImageNet Normalize. Val: same minus
  flip/jitter (transforms.py:16-24).
* ``collate_fn`` is imported from the reference itself (src/data/collate.py).

After training, convert the reference checkpoint with
``scripts/import_torch.py`` (forward-parity-pinned in tests/test_torch_port.py)
and evaluate both frameworks with ``scripts/evaluate.py --coco_map`` —
same data, same budget, same evaluator. Results: docs/QUALITY_PARITY.md.

    python scripts/parity_train.py --root ./dataset_parity --epochs 120 \
        --preset n --num_classes 8 --batch_size 4 --lr 1e-3 --seed 0
"""

import argparse
import glob
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
# drop scripts/ from sys.path (python auto-prepends it): scripts/profile.py
# would shadow the stdlib `profile` module that pstats pulls in
_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path = [p for p in sys.path
            if os.path.abspath(p or os.getcwd()) != _SCRIPTS]
sys.path.insert(0, REPO)

# pure CPU job — keep jax (imported transitively by nothing here, but be
# safe if the user env pulls it in) off the TPU relay
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def _install_torchvision_stub():
    """torchvision is absent here; the reference imports it at module level
    (src/utils/model_utils.py:4, src/data/transforms.py:2) but the training
    path never calls into it (NMS is inference-only). Same recipe as
    tests/test_torch_port.py:42."""
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.transforms.v2", "torchvision.ops"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]
    sys.modules["torchvision.transforms"].v2 = \
        sys.modules["torchvision.transforms.v2"]


# ---------------------------------------------------------------------------
# shim transforms (replicating src/data/transforms.py on plain torch)
# ---------------------------------------------------------------------------

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _rgb_to_hsv(img):
    """img: (3,H,W) float [0,1] → (h,s,v) each (H,W). Standard formulae."""
    import torch
    r, g, b = img[0], img[1], img[2]
    maxc, _ = img.max(dim=0)
    minc, _ = img.min(dim=0)
    v = maxc
    deltac = maxc - minc
    s = torch.where(maxc > 0, deltac / maxc.clamp(min=1e-12),
                    torch.zeros_like(maxc))
    dc = deltac.clamp(min=1e-12)
    rc = (maxc - r) / dc
    gc = (maxc - g) / dc
    bc = (maxc - b) / dc
    h = torch.where(maxc == r, bc - gc,
                    torch.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = torch.where(deltac > 0, h, torch.zeros_like(h))
    h = (h / 6.0) % 1.0
    return h, s, v


def _hsv_to_rgb(h, s, v):
    import torch
    i = torch.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.long() % 6
    out = torch.stack([
        torch.where(i == 0, v, torch.where(i == 1, q, torch.where(
            i == 2, p, torch.where(i == 3, p, torch.where(i == 4, t, v))))),
        torch.where(i == 0, t, torch.where(i == 1, v, torch.where(
            i == 2, v, torch.where(i == 3, q, torch.where(i == 4, p, p))))),
        torch.where(i == 0, p, torch.where(i == 1, p, torch.where(
            i == 2, t, torch.where(i == 3, v, torch.where(i == 4, v, q))))),
    ])
    return out


class ShimTransforms:
    """Train/val transform pipeline matching src/data/transforms.py.

    Operates on (PIL image, boxes XYWH float tensor) and returns
    (normalized float tensor CHW, transformed boxes) — exactly what the
    reference's torchvision-v2 Compose produces for its Dataset.
    """

    def __init__(self, train: bool, size: int = 640):
        self.train = train
        self.size = size

    def __call__(self, image, boxes):
        import numpy as np
        import torch
        from PIL import Image

        w0, h0 = image.size
        flip = self.train and torch.rand(()) < 0.5
        if flip:
            image = image.transpose(Image.FLIP_LEFT_RIGHT)
            boxes = boxes.clone()
            boxes[:, 0] = w0 - boxes[:, 0] - boxes[:, 2]   # XYWH flip
        # Resize squash (NOT letterbox — transforms.py:9)
        image = image.resize((self.size, self.size), Image.BILINEAR)
        sx, sy = self.size / w0, self.size / h0
        boxes = boxes * torch.tensor([sx, sy, sx, sy])
        img = torch.from_numpy(
            np.asarray(image, dtype=np.float32).transpose(2, 0, 1) / 255.0)
        if self.train:
            img = self._color_jitter(img)
        mean = torch.tensor(IMAGENET_MEAN).view(3, 1, 1)
        std = torch.tensor(IMAGENET_STD).view(3, 1, 1)
        img = (img - mean) / std
        return img, boxes

    @staticmethod
    def _color_jitter(img, brightness=0.2, contrast=0.2, saturation=0.2,
                      hue=0.1):
        """ColorJitter(0.2,0.2,0.2,0.1) — factors sampled uniformly, ops
        applied in random order, like torchvision v2."""
        import torch
        order = torch.randperm(4)
        for op in order.tolist():
            if op == 0:
                f = 1.0 + (torch.rand(()) * 2 - 1) * brightness
                img = (img * f).clamp(0, 1)
            elif op == 1:
                f = 1.0 + (torch.rand(()) * 2 - 1) * contrast
                gray = (0.2989 * img[0] + 0.587 * img[1]
                        + 0.114 * img[2]).mean()
                img = (gray + (img - gray) * f).clamp(0, 1)
            elif op == 2:
                f = 1.0 + (torch.rand(()) * 2 - 1) * saturation
                gray = (0.2989 * img[0] + 0.587 * img[1]
                        + 0.114 * img[2])[None]
                img = (gray + (img - gray) * f).clamp(0, 1)
            else:
                df = (torch.rand(()) * 2 - 1) * hue
                h, s, v = _rgb_to_hsv(img)
                img = _hsv_to_rgb((h + df) % 1.0, s, v).clamp(0, 1)
        return img


class ParityDataset:
    """DetectionDataset stand-in (src/data/dataset_loader.py:14-80): one
    parquet row per image, target = {'boxes': (M,5)[x,y,w,h,cls],
    'image_id', 'name'} with boxes in TOP-LEFT xywh after transforms —
    byte-identical target semantics to the reference Dataset."""

    def __init__(self, parquet_dir, image_dir, train):
        import pandas as pd
        files = sorted(glob.glob(os.path.join(parquet_dir, "*.parquet")))
        self.df = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
        self.image_dir = image_dir
        self.transform = ShimTransforms(train=train)

    def __len__(self):
        return len(self.df)

    def __getitem__(self, idx):
        import numpy as np
        import torch
        from PIL import Image
        row = self.df.iloc[idx]
        image = Image.open(
            os.path.join(self.image_dir, row["file_name"])).convert("RGB")
        boxes = torch.from_numpy(
            np.array(row["bbox"].tolist(), dtype=np.float32))
        labels = torch.from_numpy(
            np.array(row["category_id"].tolist(),
                     dtype=np.float32)).reshape(-1, 1)
        img, boxes = self.transform(image, boxes)
        target = {
            "boxes": torch.cat([boxes, labels], dim=1),
            "image_id": torch.tensor([idx]),
            "name": row["name"],
        }
        return img, target


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--root", default="./dataset_parity")
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--lr_patience", type=int, default=200,
                   help="plateau patience (200 = effectively fixed LR, "
                        "matching the fixture-proof recipe)")
    p.add_argument("--lr_factor", type=float, default=0.5)
    p.add_argument("--preset", default="n")
    p.add_argument("--num_classes", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="checkpoint dir (default <root>/experiments/"
                        "ref_checkpoints)")
    p.add_argument("--save_every", type=int, default=10,
                   help="thin reference checkpoints: keep every k-th epoch "
                        "+ the last (the reference saves all — 31 MB each)")
    args = p.parse_args()

    _install_torchvision_stub()
    if REF not in sys.path:
        sys.path.insert(0, REF)

    import torch
    torch.manual_seed(args.seed)

    from src.data.collate import collate_fn
    from src.model.losses import YoloDFLQFLoss
    from src.model.model_builder import Model
    from src.training import train_model
    from src.training.utils_train import get_optimizer

    from custom_yolo_tpu.models.presets import PRESETS

    arch = PRESETS[args.preset]
    ckpt_dir = args.out or os.path.join(args.root, "experiments",
                                        "ref_checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    train_ds = ParityDataset(
        os.path.join(args.root, "processed", "parquet", "train"),
        os.path.join(args.root, "raw", "images", "train"), train=True)
    val_ds = ParityDataset(
        os.path.join(args.root, "processed", "parquet", "val"),
        os.path.join(args.root, "raw", "images", "val"), train=False)
    print(f"[parity] train={len(train_ds)} val={len(val_ds)} "
          f"preset={args.preset} lr={args.lr} epochs={args.epochs}")

    gen = torch.Generator().manual_seed(args.seed)
    train_loader = torch.utils.data.DataLoader(
        train_ds, batch_size=args.batch_size, shuffle=True, generator=gen,
        collate_fn=collate_fn, drop_last=True, num_workers=0)
    val_loader = torch.utils.data.DataLoader(
        val_ds, batch_size=args.batch_size, shuffle=False,
        collate_fn=collate_fn, num_workers=0)

    model = Model(width=list(arch["width"]), depth=list(arch["depth"]),
                  csp=list(arch["csp"]), num_classes=args.num_classes)
    n_params = sum(q.numel() for q in model.parameters())
    print(f"[parity] reference model: {n_params/1e6:.2f} M params")

    optimizer, scheduler = get_optimizer(
        model=model, lr=args.lr, weight_decay=args.weight_decay,
        patience=args.lr_patience, factor=args.lr_factor)
    criterion = YoloDFLQFLoss(num_classes=args.num_classes,
                              lambda_box=1.5, lambda_cls=1.0)

    # thin the reference's save-every-epoch checkpoints as we go so a long
    # run doesn't fill the disk; keep epoch % k == k-1 and the newest
    orig_save = train_model.save_checkpoint

    def thinning_save(model, optimizer, epoch, val_loss,
                      checkpoint_dir="experiments/checkpoints"):
        orig_save(model, optimizer, epoch, val_loss, checkpoint_dir)
        for f in glob.glob(os.path.join(checkpoint_dir, "model_epoch_*.pth")):
            e = int(os.path.basename(f)[len("model_epoch_"):-len(".pth")])
            if e != epoch and (e + 1) % args.save_every != 0:
                os.remove(f)

    train_model.save_checkpoint = thinning_save

    train_model.train(
        model=model,
        train_loader=train_loader,
        val_loader=val_loader,
        optimizer=optimizer,
        scheduler=scheduler,
        criterion=criterion,
        initial_epoch=0,
        num_epochs=args.epochs,
        device="cpu",
        num_classes=args.num_classes,
        rank=0,
        use_wandb=False,
        wandb_instance=None,
        log_interval=10,
        checkpoint_dir=ckpt_dir,
        distributed_mode="ddp",
        precision="float32",
    )
    print(f"[parity] done — checkpoints in {ckpt_dir}")


if __name__ == "__main__":
    main()
