"""On-device batched preprocessing + augmentation.

TPU-first replacement for the reference's per-sample CPU torchvision-v2
pipeline (``src/data/transforms.py``): the host delivers uint8 batches; one
jitted function does scale→augment→normalize for the whole batch on device,
where it fuses into the first conv. Matches the reference ops:

* RandomHorizontalFlip(p=0.5) — box-aware (:8)
* squash Resize to input size — done host-side at decode (:9)
* ColorJitter(brightness=0.2, contrast=0.2, saturation=0.2, hue=0.1) (:10)
* scale to [0,1] + ImageNet Normalize (:11-13)

Color jitter uses the standard linear-RGB approximations (brightness scale,
contrast blend vs mean-gray, saturation blend vs luma, hue rotation in YIQ)
— vectorized over the batch, driven by explicit PRNG keys (the reference
never seeds, SURVEY §5 race-detection note).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)

# ITU-R 601 luma
_LUMA = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)


def _hue_rotation_matrix(theta: jnp.ndarray) -> jnp.ndarray:
    """RGB hue rotation via YIQ: R(theta) = T⁻¹ · rot(theta) · T."""
    t = jnp.asarray([[0.299, 0.587, 0.114],
                     [0.596, -0.274, -0.322],
                     [0.211, -0.523, 0.312]], jnp.float32)
    tinv = jnp.asarray([[1.0, 0.956, 0.621],
                        [1.0, -0.272, -0.647],
                        [1.0, -1.106, 1.703]], jnp.float32)
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0],
                       [0.0, 0.0, 0.0]], jnp.float32)
    rot = rot.at[1, 1].set(c).at[1, 2].set(-s)
    rot = rot.at[2, 1].set(s).at[2, 2].set(c)
    return tinv @ rot @ t


def color_jitter(images: jnp.ndarray, key: jax.Array,
                 brightness: float = 0.2, contrast: float = 0.2,
                 saturation: float = 0.2, hue: float = 0.1) -> jnp.ndarray:
    """images (N, H, W, 3) in [0,1] → jittered, per-image random factors."""
    n = images.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (n, 1, 1, 1), minval=1 - brightness,
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, (n, 1, 1, 1), minval=1 - contrast,
                            maxval=1 + contrast)
    fs = jax.random.uniform(ks, (n, 1, 1, 1), minval=1 - saturation,
                            maxval=1 + saturation)
    fh = jax.random.uniform(kh, (n,), minval=-hue, maxval=hue) * 2 * jnp.pi

    x = images * fb
    mean_gray = jnp.mean(x * _LUMA[None, None, None, :], axis=(1, 2, 3),
                         keepdims=True) * 3.0
    x = (x - mean_gray) * fc + mean_gray
    luma = jnp.sum(x * _LUMA[None, None, None, :], axis=-1, keepdims=True)
    x = (x - luma) * fs + luma
    rot = jax.vmap(_hue_rotation_matrix)(fh)          # (N, 3, 3)
    x = jnp.einsum("nhwc,ndc->nhwd", x, rot)
    return jnp.clip(x, 0.0, 1.0)


def horizontal_flip(images: jnp.ndarray, gt_boxes: jnp.ndarray,
                    key: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image random flip; center-xywh boxes flip as cx → W - cx."""
    n = images.shape[0]
    w = images.shape[2]
    flip = jax.random.bernoulli(key, 0.5, (n,))
    flipped = jnp.flip(images, axis=2)
    images = jnp.where(flip[:, None, None, None], flipped, images)
    cx = jnp.where(flip[:, None], w - gt_boxes[..., 0], gt_boxes[..., 0])
    gt_boxes = gt_boxes.at[..., 0].set(cx)
    return images, gt_boxes


def mosaic_compose(images: jnp.ndarray, gt_boxes: jnp.ndarray,
                   gt_labels: jnp.ndarray, gt_mask: jnp.ndarray,
                   src_idx: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                              jnp.ndarray]:
    """Deterministic 4-image mosaic core (randomness lives in
    :func:`mosaic`; this is separately drivable for exact-geometry tests).

    Output image i is the H×W window at offset ``(oy[i], ox[i])`` of the
    2H×2W canvas tiling sources ``src_idx[i] = (tl, tr, bl, br)``. This is
    the classic YOLO mosaic restated for TPU: full-res quadrants + one
    ``dynamic_slice`` crop — every shape static, no per-sample resize
    (ultralytics builds the same canvas then crops around a random
    center). Boxes are shifted into window coordinates, clipped, and
    dropped when degenerate (<2px a side); each output keeps the G
    highest-validity slots of the 4G candidates (the crop covers 1/4 of
    the canvas, so ~G survive on average).
    """
    n, h, w, _ = images.shape
    g = gt_boxes.shape[1]
    quads = images[src_idx]                              # (N, 4, H, W, 3)
    top = jnp.concatenate([quads[:, 0], quads[:, 1]], axis=2)
    bot = jnp.concatenate([quads[:, 2], quads[:, 3]], axis=2)
    canvas = jnp.concatenate([top, bot], axis=1)         # (N, 2H, 2W, 3)
    crop = jax.vmap(
        lambda c, y, x: jax.lax.dynamic_slice(c, (y, x, 0), (h, w, 3))
    )(canvas, oy, ox)

    # boxes → canvas coords (+quadrant offset) → window coords (−crop)
    qoff = jnp.asarray([[0, 0], [w, 0], [0, h], [w, h]], jnp.float32)
    b = gt_boxes[src_idx]                                # (N, 4, G, 4)
    labels = gt_labels[src_idx].reshape(n, 4 * g)
    mask = gt_mask[src_idx].reshape(n, 4 * g)
    cx = b[..., 0] + qoff[None, :, None, 0] - ox[:, None, None]
    cy = b[..., 1] + qoff[None, :, None, 1] - oy[:, None, None]
    x1 = jnp.clip(cx - b[..., 2] / 2, 0.0, float(w))
    x2 = jnp.clip(cx + b[..., 2] / 2, 0.0, float(w))
    y1 = jnp.clip(cy - b[..., 3] / 2, 0.0, float(h))
    y2 = jnp.clip(cy + b[..., 3] / 2, 0.0, float(h))
    bw, bh = x2 - x1, y2 - y1
    boxes = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, bw, bh],
                      axis=-1).reshape(n, 4 * g, 4)
    valid = mask & (bw > 2.0).reshape(n, 4 * g) \
                 & (bh > 2.0).reshape(n, 4 * g)

    # valid-first stable order, truncate to the original G slots
    order = jnp.argsort(~valid, axis=1, stable=True)[:, :g]
    out_boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    out_labels = jnp.take_along_axis(labels, order, axis=1)
    out_mask = jnp.take_along_axis(valid, order, axis=1)
    out_boxes = out_boxes * out_mask[..., None]          # zero the padding
    return crop, out_boxes, out_labels, out_mask


def mosaic(images: jnp.ndarray, gt_boxes: jnp.ndarray,
           gt_labels: jnp.ndarray, gt_mask: jnp.ndarray,
           key: jax.Array, prob: float
           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-sample random mosaic with probability ``prob`` (training
    extension — the reference augments with flip/jitter only,
    ``src/data/transforms.py:8-13``). Sample i mixes itself with three
    images drawn by batch permutations; the crop offset is uniform over
    the canvas, so the window always contains parts of ≥1 source."""
    n, h, w, _ = images.shape
    kp, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
    src_idx = jnp.stack([jnp.arange(n),
                         jax.random.permutation(k1, n),
                         jax.random.permutation(k2, n),
                         jax.random.permutation(k3, n)], axis=1)
    oy = jax.random.randint(k4, (n,), 0, h + 1)
    ox = jax.random.randint(k5, (n,), 0, w + 1)
    m_img, m_boxes, m_labels, m_mask = mosaic_compose(
        images, gt_boxes, gt_labels, gt_mask, src_idx, ox, oy)
    apply = jax.random.bernoulli(kp, prob, (n,))
    return (jnp.where(apply[:, None, None, None], m_img, images),
            jnp.where(apply[:, None, None], m_boxes, gt_boxes),
            jnp.where(apply[:, None], m_labels, gt_labels),
            jnp.where(apply[:, None], m_mask, gt_mask))


def mixup_compose(images: jnp.ndarray, gt_boxes: jnp.ndarray,
                  gt_labels: jnp.ndarray, gt_mask: jnp.ndarray,
                  perm: jnp.ndarray, lam: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                             jnp.ndarray]:
    """Deterministic mixup core: output i blends image i with image
    ``perm[i]`` at weight ``lam[i]`` and keeps the UNION of both images'
    boxes at full strength (detection mixup does not weight labels —
    both objects are genuinely visible in the blend). The 2G candidates
    are truncated back to the padded G slots valid-first."""
    n = images.shape[0]
    g = gt_boxes.shape[1]
    img = lam[:, None, None, None] * images \
        + (1.0 - lam[:, None, None, None]) * images[perm]
    boxes = jnp.concatenate([gt_boxes, gt_boxes[perm]], axis=1)
    labels = jnp.concatenate([gt_labels, gt_labels[perm]], axis=1)
    valid = jnp.concatenate([gt_mask, gt_mask[perm]], axis=1)
    order = jnp.argsort(~valid, axis=1, stable=True)[:, :g]
    out_boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    out_labels = jnp.take_along_axis(labels, order, axis=1)
    out_mask = jnp.take_along_axis(valid, order, axis=1)
    out_boxes = out_boxes * out_mask[..., None]
    return img, out_boxes, out_labels, out_mask


def mixup(images: jnp.ndarray, gt_boxes: jnp.ndarray,
          gt_labels: jnp.ndarray, gt_mask: jnp.ndarray,
          key: jax.Array, prob: float, alpha: float = 32.0
          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-sample random mixup with probability ``prob`` (training
    extension; ultralytics pairs mosaics with Beta(32,32) weights — a
    blend near 0.5 where both scenes stay clearly visible)."""
    n = images.shape[0]
    kp, kperm, klam = jax.random.split(key, 3)
    perm = jax.random.permutation(kperm, n)
    lam = jax.random.beta(klam, alpha, alpha, (n,)).astype(images.dtype)
    m_img, m_boxes, m_labels, m_mask = mixup_compose(
        images, gt_boxes, gt_labels, gt_mask, perm, lam)
    apply = jax.random.bernoulli(kp, prob, (n,))
    return (jnp.where(apply[:, None, None, None], m_img, images),
            jnp.where(apply[:, None, None], m_boxes, gt_boxes),
            jnp.where(apply[:, None], m_labels, gt_labels),
            jnp.where(apply[:, None], m_mask, gt_mask))


@functools.partial(jax.jit, static_argnames=("train",),
                   donate_argnums=(0,))
def batch_preprocess(images_u8: jnp.ndarray, gt_boxes: jnp.ndarray,
                     key: jax.Array, train: bool = True
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """uint8 batch → normalized float batch (+ flip-adjusted boxes)."""
    x = images_u8.astype(jnp.float32) / 255.0
    if train:
        kf, kj = jax.random.split(key)
        x, gt_boxes = horizontal_flip(x, gt_boxes, kf)
        x = color_jitter(x, kj)
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x, gt_boxes


@functools.partial(jax.jit,
                   static_argnames=("train", "mosaic_prob", "mixup_prob"),
                   donate_argnums=(0,))
def batch_augment(images_u8: jnp.ndarray, gt_boxes: jnp.ndarray,
                  gt_labels: jnp.ndarray, gt_mask: jnp.ndarray,
                  key: jax.Array, train: bool = True,
                  mosaic_prob: float = 0.0, mixup_prob: float = 0.0):
    """Full label-aware augmentation program: optional mosaic → optional
    mixup (both need labels/mask, unlike :func:`batch_preprocess`) →
    flip → jitter → normalize, one XLA program over the whole batch."""
    x = images_u8.astype(jnp.float32) / 255.0
    if train:
        km, kx, kf, kj = jax.random.split(key, 4)
        if mosaic_prob > 0.0:
            x, gt_boxes, gt_labels, gt_mask = mosaic(
                x, gt_boxes, gt_labels, gt_mask, km, mosaic_prob)
        if mixup_prob > 0.0:
            x, gt_boxes, gt_labels, gt_mask = mixup(
                x, gt_boxes, gt_labels, gt_mask, kx, mixup_prob)
        x, gt_boxes = horizontal_flip(x, gt_boxes, kf)
        x = color_jitter(x, kj)
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x, gt_boxes, gt_labels, gt_mask


def letterbox_resize(image: jnp.ndarray, target: Tuple[int, int],
                     pad_value: float = 114.0 / 255.0
                     ) -> Tuple[jnp.ndarray, float, Tuple[int, int]]:
    """Aspect-preserving resize + pad to `target` (the standard YOLO
    letterbox; the reference squash-resizes instead — transforms.py:9 —
    which distorts aspect ratio). On-device, float input in [0,1].

    Returns (letterboxed (H,W,C), scale, (pad_x, pad_y)); boxes map as
    ``b * scale + pad``.
    """
    h, w = image.shape[0], image.shape[1]
    th, tw = target
    scale = min(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = jax.image.resize(image, (nh, nw, image.shape[2]), "bilinear")
    pad_y, pad_x = (th - nh) // 2, (tw - nw) // 2
    out = jnp.full((th, tw, image.shape[2]), pad_value, image.dtype)
    out = jax.lax.dynamic_update_slice(out, resized, (pad_y, pad_x, 0))
    return out, scale, (pad_x, pad_y)


def make_device_batch(host_batch: Dict, key: jax.Array, train: bool = True,
                      mosaic_prob: float = 0.0, mixup_prob: float = 0.0
                      ) -> Dict[str, jnp.ndarray]:
    """Host uint8 batch dict → device batch dict consumed by train_step."""
    if train and (mosaic_prob > 0.0 or mixup_prob > 0.0):
        images, gt_boxes, gt_labels, gt_mask = batch_augment(
            jnp.asarray(host_batch["image"]),
            jnp.asarray(host_batch["gt_boxes"]),
            jnp.asarray(host_batch["gt_labels"]),
            jnp.asarray(host_batch["gt_mask"]),
            key, train=True, mosaic_prob=mosaic_prob,
            mixup_prob=mixup_prob)
        return {"images": images, "gt_boxes": gt_boxes,
                "gt_labels": gt_labels, "gt_mask": gt_mask}
    images, gt_boxes = batch_preprocess(
        jnp.asarray(host_batch["image"]),
        jnp.asarray(host_batch["gt_boxes"]), key, train=train)
    return {
        "images": images,
        "gt_boxes": gt_boxes,
        "gt_labels": jnp.asarray(host_batch["gt_labels"]),
        "gt_mask": jnp.asarray(host_batch["gt_mask"]),
    }
