from custom_yolo_tpu.ops.pallas.nms_kernel import nms_keep_pallas  # noqa: F401
