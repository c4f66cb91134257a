from custom_yolo_tpu.models.backbone import Backbone  # noqa: F401
from custom_yolo_tpu.models.neck import Neck  # noqa: F401
from custom_yolo_tpu.models.head import Head  # noqa: F401
from custom_yolo_tpu.models.detector import (  # noqa: F401
    Detector, YoloModel, fuse_params)
from custom_yolo_tpu.models.presets import PRESETS  # noqa: F401
