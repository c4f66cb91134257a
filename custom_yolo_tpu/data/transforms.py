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


def make_device_batch(host_batch: Dict, key: jax.Array, train: bool = True
                      ) -> Dict[str, jnp.ndarray]:
    """Host uint8 batch dict → device batch dict consumed by train_step."""
    images, gt_boxes = batch_preprocess(
        jnp.asarray(host_batch["image"]),
        jnp.asarray(host_batch["gt_boxes"]), key, train=train)
    return {
        "images": images,
        "gt_boxes": gt_boxes,
        "gt_labels": jnp.asarray(host_batch["gt_labels"]),
        "gt_mask": jnp.asarray(host_batch["gt_mask"]),
    }
