"""Entry point mirroring the reference's ``python -m conditional_diffusion``
(class-conditional MNIST DDPM).
Implementation: tinydiffusion_tpu/experiments/conditional_diffusion.py."""

from tinydiffusion_tpu.experiments.conditional_diffusion import main

if __name__ == "__main__":
    main()
