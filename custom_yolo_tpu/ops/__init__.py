from custom_yolo_tpu.ops.anchors import make_anchors  # noqa: F401
from custom_yolo_tpu.ops.boxes import (  # noqa: F401
    box_ciou, box_iou_aligned, box_iou_pairwise, dist2bbox, xywh2xyxy,
    xyxy2xywh)
from custom_yolo_tpu.ops.dfl import dfl_decode  # noqa: F401
from custom_yolo_tpu.ops.nms import batched_nms  # noqa: F401
