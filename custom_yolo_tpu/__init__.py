"""custom_yolo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-class object
detection framework.

Brand-new implementation of the capabilities of the PyTorch reference
``DarylFernandes99/custom-yolo-implmentation`` (YOLOv11-style CSP detector on
COCO-2017), re-designed TPU-first:

* functional flax.linen modules in NHWC layout, bf16 compute / fp32 params
* anchor-free decoupled DFL head with a fully vectorized (no per-image python
  loop) QFL+DFL loss and nearest-center / TAL assigners
* fixed-shape batched NMS (pure-XLA and Pallas variants)
* ``jax.sharding.Mesh`` data/FSDP parallelism over ICI instead of NCCL
* host-side Parquet/COCO ETL with padded fixed-shape GT batches
* orbax checkpointing, jax.profiler tracing, greedy + COCO mAP evaluators
"""

__version__ = "0.1.0"

import os as _os


def _sync_platform_from_env() -> None:
    """Restore ``JAX_PLATFORMS`` env-var semantics under the axon bootstrap.

    The TPU-relay sitecustomize freezes ``jax_platforms="axon,cpu"`` into
    jax.config at interpreter start, which OVERRIDES the env var even when it
    is set before python launches — so a subprocess launched with
    ``JAX_PLATFORMS=cpu`` (the test suite, CI, the driver's virtual-mesh
    dryrun) silently lands on the TPU relay. Re-apply the env var's intent at
    package import (before any backend is touched). Only non-axon requests
    are synced: the axon path keeps whatever the bootstrap configured."""
    want = _os.environ.get("JAX_PLATFORMS", "")
    if not want or "axon" in want.split(","):
        return
    try:
        import jax
        if str(jax.config.jax_platforms or "") != want:
            jax.config.update("jax_platforms", want)
    except Exception:  # jax absent/ancient: never block package import
        pass


_sync_platform_from_env()

from custom_yolo_tpu.config import Config, load_config  # noqa: F401
