from custom_yolo_tpu.data.dataset import DetectionDataset  # noqa: F401
from custom_yolo_tpu.data.loader import DataLoader, get_data_loaders  # noqa: F401
