from tinydiffusion_tpu.obs.images import make_grid, save_image_grid
from tinydiffusion_tpu.obs.metrics import MetricsLogger

__all__ = ["make_grid", "save_image_grid", "MetricsLogger"]
