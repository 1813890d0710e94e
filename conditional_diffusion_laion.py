"""Entry point mirroring the reference's ``python -m conditional_diffusion_laion``
(text-conditional latent diffusion; offline substitutes for SD-VAE/CLIP by
default in this zero-egress environment — see compat/latent_codec.py and
compat/text_encoder.py).
Implementation: tinydiffusion_tpu/experiments/conditional_diffusion_laion.py."""

from tinydiffusion_tpu.experiments.conditional_diffusion_laion import main

if __name__ == "__main__":
    main()
