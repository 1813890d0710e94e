from tinydiffusion_tpu.nn.resize import (
    resize_bilinear_align_corners,
    upsample_bilinear_2x,
    max_pool_ceil,
)
from tinydiffusion_tpu.nn.layers import ConvBNRelu, DoubleConvBlock, TimeEmbedMLP

__all__ = [
    "resize_bilinear_align_corners",
    "upsample_bilinear_2x",
    "max_pool_ceil",
    "ConvBNRelu",
    "DoubleConvBlock",
    "TimeEmbedMLP",
]
