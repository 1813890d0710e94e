"""Entry point mirroring the reference's ``python -m diffusion_transformer``
(DiT backbone over the MNIST VAE latents; same two-stage stack as
latent_diffusion with a transformer denoiser, Adam 3e-4 + per-epoch cosine
schedule — diffusion_transformer.py:176-177, 288).
Implementation: tinydiffusion_tpu/experiments/latent_diffusion.py (backbone="dit")."""

import sys

from tinydiffusion_tpu.experiments.latent_diffusion import main

if __name__ == "__main__":
    main(["--backbone", "dit", "--out-dir", "runs/diffusion_transformer",
          "--model-save-path", "checkpoints/diffusion_transformer_best",
          *sys.argv[1:]])
