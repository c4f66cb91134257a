from custom_yolo_tpu.train.losses import DetectionLoss, LossConfig  # noqa: F401
from custom_yolo_tpu.train.train_state import TrainState  # noqa: F401
from custom_yolo_tpu.train.trainer import Trainer  # noqa: F401
