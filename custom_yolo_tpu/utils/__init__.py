from custom_yolo_tpu.utils.common import get_num_workers  # noqa: F401
from custom_yolo_tpu.utils.config_loader import load_config  # noqa: F401
