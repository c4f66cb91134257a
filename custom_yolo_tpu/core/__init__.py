from custom_yolo_tpu.core.dtypes import DTypePolicy, resolve_policy  # noqa: F401
from custom_yolo_tpu.core.mesh import (  # noqa: F401
    MeshSpec, create_mesh, data_axis, fsdp_axis)
