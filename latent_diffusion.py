"""Entry point mirroring the reference's ``python -m latent_diffusion``
(class-conditional latent diffusion over the MNIST VAE).
Implementation: tinydiffusion_tpu/experiments/latent_diffusion.py."""

from tinydiffusion_tpu.experiments.latent_diffusion import main

if __name__ == "__main__":
    main()
