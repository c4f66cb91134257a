from custom_yolo_tpu.nn.blocks import (  # noqa: F401
    PSA, SPPF, Attention, C3K, C3K2, ConvBN, PSABlock, Residual)
