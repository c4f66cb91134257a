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


def test_pallas_attention_custom_vjp_grads_fp32():
    """Gradient parity: the Pallas custom-VJP backward (softmax recomputed
    in VMEM) vs jax.grad through the einsum reference. Both out and v
    cotangents are exercised (v feeds the positional depthwise branch)."""
    from custom_yolo_tpu.ops.pallas.attention_kernel import psa_attention

    qkv = _rand_qkv(2, 16, 2, 8, 16, seed=4)
    w_out = jnp.asarray(np.random.RandomState(5).randn(2, 16, 32),
                        jnp.float32)
    w_v = jnp.asarray(np.random.RandomState(6).randn(2, 16, 32), jnp.float32)

    def loss_k(x):
        o, v = psa_attention(x, 2, 8, 16, True)
        return jnp.sum(o * w_out) + jnp.sum(jnp.tanh(v) * w_v)

    def loss_r(x):
        o, v = psa_attention_reference(x, 2, 8, 16)
        return jnp.sum(o * w_out) + jnp.sum(jnp.tanh(v) * w_v)

    g_k = jax.grad(loss_k)(qkv)
    g_r = jax.grad(loss_r)(qkv)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               atol=1e-4, rtol=1e-4)


def test_pallas_attention_custom_vjp_grads_bf16_x_shape():
    """Flagship p5 shape, bf16 — the training configuration the custom VJP
    is built for."""
    from custom_yolo_tpu.ops.pallas.attention_kernel import psa_attention

    qkv = _rand_qkv(1, 400, 6, 32, 64, seed=7, dtype=jnp.bfloat16)

    def loss_k(x):
        o, v = psa_attention(x, 6, 32, 64, True)
        return (jnp.sum(o.astype(jnp.float32) ** 2)
                + jnp.sum(v.astype(jnp.float32) ** 2))

    def loss_r(x):
        o, v = psa_attention_reference(x, 6, 32, 64)
        return (jnp.sum(o.astype(jnp.float32) ** 2)
                + jnp.sum(v.astype(jnp.float32) ** 2))

    g_k = np.asarray(jax.grad(loss_k)(qkv), np.float32)
    g_r = np.asarray(jax.grad(loss_r)(qkv), np.float32)
    # bf16 grads: elementwise comparison at bf16 resolution, plus a tight
    # check on the overall direction/magnitude
    np.testing.assert_allclose(g_k, g_r, atol=0.15, rtol=0.15)
    cos = (g_k * g_r).sum() / (np.linalg.norm(g_k) * np.linalg.norm(g_r))
    assert cos > 0.999


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
