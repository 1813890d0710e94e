"""Entry point mirroring the reference's ``python -m vae_laion``
(conv beta-VAE with self-attention + spectral norm on LAION-style images;
offline synthetic source by default in this zero-egress environment).
Implementation: tinydiffusion_tpu/experiments/vae_laion.py."""

from tinydiffusion_tpu.experiments.vae_laion import main

if __name__ == "__main__":
    main()
