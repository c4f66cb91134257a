"""Parity tests: fused Pallas PSA attention vs the einsum reference
(interpret mode on CPU — the same kernel Mosaic compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from custom_yolo_tpu.ops.pallas.attention_kernel import (
    psa_attention_pallas, psa_attention_reference)


def _rand_qkv(b, t, nh, dk, dh, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, t, nh * (2 * dk + dh)), dtype)


def test_pallas_attention_matches_reference_fp32():
    qkv = _rand_qkv(2, 16, 2, 8, 16, seed=1)
    out_p, v_p = psa_attention_pallas(qkv, 2, 8, 16, interpret=True)
    out_r, v_r = psa_attention_reference(qkv, 2, 8, 16)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_r), atol=0)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               atol=1e-5, rtol=1e-5)


def test_pallas_attention_matches_reference_bf16_x_shape():
    """The flagship p5 shape: T=400, nh=6, dk=32, dh=64, bf16."""
    qkv = _rand_qkv(2, 400, 6, 32, 64, seed=2, dtype=jnp.bfloat16)
    out_p, v_p = psa_attention_pallas(qkv, 6, 32, 64, interpret=True)
    out_r, v_r = psa_attention_reference(qkv, 6, 32, 64)
    np.testing.assert_array_equal(np.asarray(v_p, np.float32),
                                  np.asarray(v_r, np.float32))
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_r, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_attention_block_shapes_and_finite(tiny_model):
    """Attention module forward (CPU → einsum path, the same numerics the
    TPU Pallas gate must reproduce): shape contract + finiteness."""
    from custom_yolo_tpu.core.dtypes import resolve_policy
    from custom_yolo_tpu.nn.blocks import Attention

    attn = Attention(2, policy=resolve_policy("float32"))
    x = jnp.asarray(np.random.RandomState(3).randn(2, 8, 8, 128),
                    jnp.float32)
    variables = attn.init(jax.random.key(0), x, train=False)
    out = attn.apply(variables, x, train=False)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
