"""Entry point mirroring the reference's ``python -m diffusion``
(unconditional MNIST DDPM). Implementation: tinydiffusion_tpu/experiments/diffusion.py."""

from tinydiffusion_tpu.experiments.diffusion import main

if __name__ == "__main__":
    main()
