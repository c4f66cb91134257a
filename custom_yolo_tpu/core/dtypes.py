"""Mixed-precision policy.

TPU-native replacement for the reference's three-way AMP story (autocast for
DDP, ``MixedPrecision``/``MixedPrecisionPolicy`` for FSDP1/2, GradScaler for
fp16 — ``src/training/train_model.py:191-210,240-243`` and
``utils_train.py:81-89,146-153``): on TPU we keep parameters and BatchNorm
statistics in float32 and compute in bfloat16. bf16 has the same exponent
range as fp32 so no loss scaling is needed.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # BatchNorm running statistics always fp32 — the reference had to patch
    # buffer dtypes for exactly this (utils_train.py:151-153).
    norm_stat_dtype: jnp.dtype = jnp.float32
    # Loss / reductions in fp32 (reference casts preds to float, losses.py:142)
    loss_dtype: jnp.dtype = jnp.float32


_POLICIES = {
    "bfloat16": DTypePolicy(compute_dtype=jnp.bfloat16),
    "float32": DTypePolicy(compute_dtype=jnp.float32),
    # fp16 accepted for config parity with the reference
    # (config.yaml:76,79,83) but mapped to bf16: fp16 has no advantage on TPU
    # and would need loss scaling.
    "float16": DTypePolicy(compute_dtype=jnp.bfloat16),
}


def resolve_policy(precision: str) -> DTypePolicy:
    try:
        return _POLICIES[precision]
    except KeyError:
        raise ValueError(
            f"precision must be one of {sorted(_POLICIES)}, got {precision!r}")
