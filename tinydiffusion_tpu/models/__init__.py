from tinydiffusion_tpu.models.unet28 import UNet28

__all__ = ["UNet28"]
