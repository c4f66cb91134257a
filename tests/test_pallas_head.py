"""Parity: fused cls-tower Pallas kernel vs the XLA conv chain
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from custom_yolo_tpu.ops.pallas.head_kernel import (
    cls_tower_pallas, cls_tower_reference)


def _params(cin, mid, nc, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
    return (
        (mk(3, 3, cin), mk(cin)),        # dw1
        (mk(cin, mid), mk(mid)),         # pw1
        (mk(3, 3, mid), mk(mid)),        # dw2
        (mk(mid, mid), mk(mid)),         # pw2
        (mk(mid, nc), mk(nc)),           # out
    )


def test_cls_tower_matches_reference_fp32():
    dw1, pw1, dw2, pw2, out = _params(128, 128, 17)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 128)
                    .astype(np.float32))
    got = cls_tower_pallas(x, dw1, pw1, dw2, pw2, out, interpret=True)
    ref = cls_tower_reference(x, dw1, pw1, dw2, pw2, out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_cls_tower_multi_group_bf16():
    """Level-0 flagship shape class: cin=384 (3 groups), mid=384, nc=172."""
    dw1, pw1, dw2, pw2, out = _params(384, 384, 172, seed=2)
    to16 = lambda t: tuple(x.astype(jnp.bfloat16) for x in t)
    dw1, pw1, dw2, pw2, out = map(to16, (dw1, pw1, dw2, pw2, out))
    x = jnp.asarray(np.random.RandomState(3).randn(1, 16, 16, 384),
                    jnp.bfloat16)
    got = cls_tower_pallas(x, dw1, pw1, dw2, pw2, out, interpret=True)
    ref = cls_tower_reference(x, dw1, pw1, dw2, pw2, out)
    g = np.asarray(got, np.float32)
    r = np.asarray(ref, np.float32)
    denom = np.abs(r).max()
    assert np.abs(g - r).max() / denom < 3e-2, np.abs(g - r).max() / denom


def test_cls_tower_row_chunking_matches_unchunked():
    """The VMEM row-chunking path (overlapping slices, halo rows dropped)
    must be exact vs the single-call kernel."""
    from custom_yolo_tpu.ops.pallas.head_kernel import _dwpw_stage

    dw1, pw1, _, _, _ = _params(128, 128, 17, seed=4)
    x = jnp.asarray(np.random.RandomState(5).randn(2, 32, 8, 128)
                    .astype(np.float32))
    full = _dwpw_stage(x, dw1[0].reshape(3, 3, 128), dw1[1],
                       pw1[0], pw1[1], interpret=True)
    chunked = _dwpw_stage(x, dw1[0].reshape(3, 3, 128), dw1[1],
                          pw1[0], pw1[1], interpret=True, max_rows=10)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5, rtol=1e-5)
