"""Distribution-Focal-Loss box decode.

Equivalent of the reference's frozen-conv ``DFL`` module
(``src/model/model_blocks.py:254-280``) and the duplicated softmax-
expectation decodes in the loss (losses.py:154-159) and metrics path
(train_model.py:44-49). TPU-first: one pure function — softmax over the bin
axis then expectation, which XLA fuses into adjacent ops; the reference's
1×1-conv trick exists only because torch modules need parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dfl_decode(pred_dist: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """(..., M, 4*reg_max) distribution logits → (..., M, 4) expected ltrb.

    The 4*reg_max channel layout matches the reference head: channel block i
    (of 4) holds the reg_max logits of side i (model_blocks.py:278-280 view).
    """
    shape = pred_dist.shape
    dist = pred_dist.reshape(*shape[:-1], 4, reg_max)
    probs = jax.nn.softmax(dist.astype(jnp.float32), axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(probs * bins, axis=-1)


def dfl_expectation_matmul(pred_dist: jnp.ndarray,
                           reg_max: int = 16) -> jnp.ndarray:
    """MXU-friendly variant: expectation expressed as a (reg_max,) matvec so
    XLA can batch it as one matmul when M is large. Numerically identical to
    :func:`dfl_decode`."""
    shape = pred_dist.shape
    dist = pred_dist.reshape(*shape[:-1], 4, reg_max)
    probs = jax.nn.softmax(dist.astype(jnp.float32), axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.einsum("...k,k->...", probs, bins,
                      preferred_element_type=jnp.float32)
