"""Anchor-point generation.

Equivalent of the reference ``make_anchors``
(``src/utils/model_utils.py:18-70``): cell-center (x, y) coordinates in
feature-map units plus a per-anchor stride. TPU-first differences: shapes are
*static* (computed from python ints at trace time, never from traced
tensors), and the result is anchor-major ``(M, 2)`` / ``(M, 1)`` to match the
framework-wide (batch, anchor, channel) layout.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def make_anchors(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    offset: float = 0.5,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build anchor centers for a list of (H, W) feature-map shapes.

    Returns:
      anchors: (M, 2) — (x, y) cell centers, x varies fastest (row-major
        (H, W) flattening, same ordering as the reference meshgrid
        ``model_utils.py:63-67``).
      stride_per_anchor: (M, 1).
    """
    assert len(feat_shapes) == len(strides)
    anchor_parts: List[np.ndarray] = []
    stride_parts: List[np.ndarray] = []
    for (h, w), stride in zip(feat_shapes, strides):
        sx = np.arange(w, dtype=np.float64) + offset
        sy = np.arange(h, dtype=np.float64) + offset
        gx, gy = np.meshgrid(sx, sy)             # (h, w) each, x fastest
        anchor_parts.append(np.stack([gx, gy], axis=-1).reshape(-1, 2))
        stride_parts.append(np.full((h * w, 1), float(stride)))
    anchors = np.concatenate(anchor_parts, axis=0)
    stride_arr = np.concatenate(stride_parts, axis=0)
    return jnp.asarray(anchors, dtype=dtype), jnp.asarray(stride_arr, dtype=dtype)


def level_shapes(input_size: Tuple[int, int],
                 strides: Sequence[int] = (8, 16, 32)) -> List[Tuple[int, int]]:
    """Feature-map shapes for each detection level at a given input size
    (static analogue of the reference's dummy-forward stride probe,
    ``model_builder.py:37-43``)."""
    h, w = input_size
    return [(h // s, w // s) for s in strides]


def num_anchors(input_size: Tuple[int, int],
                strides: Sequence[int] = (8, 16, 32)) -> int:
    return sum(h * w for h, w in level_shapes(input_size, strides))
