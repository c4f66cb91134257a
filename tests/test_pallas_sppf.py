"""Parity: fused Pallas SPPF pooling pyramid vs reduce_window (interpret
mode on CPU — same kernel Mosaic compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from custom_yolo_tpu.nn.blocks import _maxpool_same
from custom_yolo_tpu.ops.pallas.sppf_kernel import sppf_pyramid_pallas


def _reference(x):
    y1 = _maxpool_same(x, 5)
    y2 = _maxpool_same(y1, 5)
    y3 = _maxpool_same(y2, 5)
    return jnp.concatenate([x, y1, y2, y3], axis=-1)


def test_sppf_pyramid_matches_reduce_window():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 20, 20, 384).astype(np.float32))
    got = sppf_pyramid_pallas(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_reference(x)))


def test_sppf_pyramid_bf16_small():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 8, 8, 128), jnp.bfloat16)
    got = sppf_pyramid_pallas(x, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(_reference(x), np.float32))
