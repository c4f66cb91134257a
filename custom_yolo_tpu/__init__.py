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

from custom_yolo_tpu.config import Config, load_config  # noqa: F401
