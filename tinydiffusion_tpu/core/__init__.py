from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.core.process import q_sample
from tinydiffusion_tpu.core.sampler import ddpm_sample, ddpm_denoising_trajectory
from tinydiffusion_tpu.core.embeddings import sinusoidal_time_embedding

__all__ = [
    "DiffusionSchedule",
    "q_sample",
    "ddpm_sample",
    "ddpm_denoising_trajectory",
    "sinusoidal_time_embedding",
]
