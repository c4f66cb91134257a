"""Multi-chip serving — the sharded counterpart of ``Detector.serve``.

The reference runs inference under the same process-group world as training
(``src/model/model_builder.py:79-139`` called per rank); the TPU-native
equivalent is data-parallel serving over a device mesh. Serving is
embarrassingly batch-parallel, so instead of handing the whole graph to the
GSPMD partitioner (whose treatment of ``pallas_call`` ops without sharding
rules is to force operand replication), the entire forward + DFL decode +
NMS pipeline runs inside ONE ``shard_map`` over the batch axes:

* params/batch_stats are replicated (in_spec ``P()``),
* the image batch is split over ``(data, fsdp)``,
* each device runs the full single-chip serving program — including the
  Pallas NMS / attention kernels, which see ordinary local arrays and need
  no GSPMD story — and emits its shard of the fixed-shape ``NMSResult``.

No collectives are needed (outputs stay batch-sharded), so multi-chip
serving throughput is N× single-chip by construction, modulo host I/O.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from custom_yolo_tpu.core.mesh import DATA_AXIS, FSDP_AXIS
from custom_yolo_tpu.ops.nms import batched_nms


def make_sharded_serve_fn(module, mesh: Mesh, reg_max: int = 16,
                          conf_thres: float = 0.25, iou_thres: float = 0.45,
                          max_det: int = 300, top_k: int = 1024,
                          merge: bool = False,
                          class_filter: Optional[Tuple[int, ...]] = None,
                          multi_label: bool = False):
    """Build ``serve_fn(variables, images) -> NMSResult`` jitted over
    ``mesh``. ``images`` must have batch divisible by the mesh size (the
    loader's ``pad_to_multiple`` handles ragged batches). The per-device
    body is identical to ``Detector.serve``'s program (detector.py:489+),
    so mesh results == single-device results (test-asserted,
    tests/test_sharding.py)."""
    from custom_yolo_tpu.models.detector import decode_raw_predictions

    batch_axes = (DATA_AXIS, FSDP_AXIS)

    def local_serve(variables, images):
        preds, anchors, strides = module.apply(variables, images,
                                               train=False)
        boxes, scores = decode_raw_predictions(preds, anchors, strides,
                                               reg_max)
        best_scores = scores.max(axis=-1)
        best_classes = scores.argmax(axis=-1)
        return batched_nms(boxes, best_scores, best_classes,
                           conf_thres=conf_thres, iou_thres=iou_thres,
                           max_det=max_det, top_k=top_k, merge=merge,
                           class_filter=class_filter,
                           multi_label=multi_label,
                           all_scores=scores if multi_label else None)

    fn = jax.shard_map(local_serve, mesh=mesh,
                       in_specs=(P(), P(batch_axes)),
                       out_specs=P(batch_axes),
                       check_vma=False)
    return jax.jit(fn)


def shard_serve_batch(images, mesh: Mesh):
    """Host images → global device array split over the mesh batch axes."""
    return jax.device_put(
        images, NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS))))
