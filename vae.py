"""Entry point mirroring the reference's ``python -m vae`` (MNIST MLP VAE
pretraining; produces checkpoints/vae_mnist_best consumed by
latent_diffusion and diffusion_transformer).
Implementation: tinydiffusion_tpu/experiments/vae.py."""

from tinydiffusion_tpu.experiments.vae import main

if __name__ == "__main__":
    main()
