from custom_yolo_tpu.eval.metrics import DetectionMetrics  # noqa: F401
from custom_yolo_tpu.eval.decode import decode_predictions  # noqa: F401
from custom_yolo_tpu.eval.coco_map import COCOmAP  # noqa: F401
