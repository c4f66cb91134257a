"""Raw-dict config loader — identical surface to the reference
(``src/utils/config_loader.py:3-6``). Prefer ``custom_yolo_tpu.config.Config``
for the typed interface."""

from custom_yolo_tpu.config import load_config  # noqa: F401
