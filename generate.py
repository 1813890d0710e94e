"""Inference entry point: sample images from a trained checkpoint.

The reference has no serving layer — its ``sample()`` functions are only
reachable from inside training scripts (SURVEY.md §3.5). This CLI is the
standalone generation path: load an Orbax checkpoint produced by any of the
pixel-space experiments and run the compiled reverse chain — the
reference-faithful 1000-step ancestral sampler, or the accelerated DDIM
serving path (same checkpoint, ~T/steps x fewer model forwards).

  python generate.py --checkpoint checkpoints/diffusion_final --n 64 --out samples.png
  python generate.py --checkpoint checkpoints/conditional_diffusion_best --digit 7
  python generate.py --checkpoint checkpoints/diffusion_final --sampler ddim --sample-steps 50
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def _generate_latent(args, parser):
    """Latent-family serving: latent reverse chain (any --sampler) + VAE
    decode (latent_diffusion.py:308-347 semantics, outside the training
    loop — the reference can only sample inside it)."""
    from tinydiffusion_tpu.experiments.common import (
        load_latent_checkpoint,
        make_latent_pixel_sampler,
        resolve_dtype,
    )
    from tinydiffusion_tpu.obs.images import save_image_grid

    if args.init_image or args.inpaint_image or args.guidance_scale != 1.0:
        parser.error(
            "img2img/inpainting/guidance are pixel-checkpoint modes; latent "
            "checkpoints support plain sampling with any --sampler"
        )
    loaded = load_latent_checkpoint(args.checkpoint)
    print(
        f"loaded {args.checkpoint} "
        f"(backbone {loaded['cfg']['backbone']}, step "
        f"{int(loaded['state'].step)}"
        + (", sampling from EMA params)" if loaded["use_ema"] else ")")
    )
    sampler = make_latent_pixel_sampler(
        loaded, args.n, method=args.sampler, sample_steps=args.sample_steps,
        eta=args.eta, dtype=resolve_dtype(args.sample_dtype),
    )
    key = jax.random.PRNGKey(args.seed)
    if args.digit is not None:
        y = jnp.full((args.n,), args.digit, jnp.int32)
    else:
        key, y_key = jax.random.split(key)
        y = jax.random.randint(y_key, (args.n,), 0, loaded["num_classes"])
    samples = sampler(key, y)
    images = np.asarray(jax.device_get((samples + 1) / 2), np.float32)
    nrow = max(int(np.sqrt(args.n)), 1)
    save_image_grid(images, args.out, nrow=nrow, labels=np.asarray(y))
    print(f"wrote {args.n} samples to {args.out}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--n", type=int, default=16)
    parser.add_argument("--out", default="generated.png")
    parser.add_argument("--digit", type=int, default=None,
                        help="class label (conditional checkpoints only)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num-timesteps", type=int, default=1000)
    parser.add_argument("--sample-dtype", default="float32")
    parser.add_argument("--sampler", choices=["ddpm", "ddim", "dpmpp"],
                        default="ddpm",
                        help="ddpm = reference-faithful T-step ancestral "
                             "chain; ddim = accelerated serving path; dpmpp "
                             "= DPM-Solver++(2M), DDIM-50 quality in ~10-15 "
                             "steps")
    parser.add_argument("--sample-steps", type=int, default=50,
                        help="ddim/dpmpp model forwards (ignored for ddpm)")
    parser.add_argument("--eta", type=float, default=0.0,
                        help="DDIM stochasticity (0 = deterministic)")
    parser.add_argument("--guidance-scale", type=float, default=1.0,
                        help="classifier-free guidance scale (checkpoints "
                             "trained with --label-dropout only; 1 = off)")
    parser.add_argument("--init-image", default=None,
                        help="img2img: PNG to start from (DDIM only); the "
                             "chain denoises from --strength of the way up")
    parser.add_argument("--strength", type=float, default=0.6,
                        help="img2img noise level in (0, 1]: fraction of "
                             "the chain re-run (higher = less faithful)")
    parser.add_argument("--inpaint-image", default=None,
                        help="inpainting: PNG with the known content")
    parser.add_argument("--inpaint-mask", default=None,
                        help="inpainting: PNG mask (white = keep known)")
    args = parser.parse_args(argv)

    from tinydiffusion_tpu.core.process import q_sample_with_noise
    from tinydiffusion_tpu.experiments.common import (
        load_pixel_checkpoint,
        make_sampler,
        resolve_dtype,
    )
    from tinydiffusion_tpu.io.checkpoint import load_sidecar
    from tinydiffusion_tpu.obs.images import save_image_grid

    # One serving CLI for the whole MNIST-family zoo: the sidecar's
    # 'backbone' key marks a latent checkpoint (latent_diffusion.py /
    # diffusion_transformer.py), which samples in latent space and decodes
    # through its recorded VAE.
    if "backbone" in load_sidecar(args.checkpoint).get("config", {}):
        return _generate_latent(args, parser)

    loaded = load_pixel_checkpoint(args.checkpoint)
    model, state, params = loaded["model"], loaded["state"], loaded["params"]
    cfg, schedule = loaded["cfg"], loaded["schedule"]
    conditional, num_classes = loaded["conditional"], loaded["num_classes"]
    cfg_trained, use_ema = loaded["cfg_trained"], loaded["use_ema"]
    if "num_timesteps" not in cfg and args.num_timesteps != 1000:
        # Sidecars always record T; the flag only matters for foreign or
        # hand-written checkpoints without one.
        from tinydiffusion_tpu.core.schedule import DiffusionSchedule

        schedule = DiffusionSchedule.make(
            cfg.get("noise_schedule", "linear"), args.num_timesteps
        )
    T = schedule.num_timesteps

    if args.guidance_scale != 1.0 and not cfg_trained:
        parser.error(
            "--guidance-scale needs a checkpoint trained with "
            "--label-dropout > 0 (no null-class embedding row here)"
        )
    print(f"loaded {args.checkpoint} (step {int(state.step)}"
          + (", sampling from EMA params)" if use_ema else ")"))

    def load_image28(path):
        from PIL import Image

        img = Image.open(path).convert("L").resize((28, 28))
        return (np.asarray(img, np.float32) / 255.0 * 2 - 1).reshape(28, 28, 1)

    t_start = mask = x_known = None
    if args.init_image:
        if args.sampler != "ddim":
            parser.error("--init-image (img2img) requires --sampler ddim")
        if not 0.0 < args.strength <= 1.0:
            parser.error("--strength must be in (0, 1]")
        t_start = max(int(round(args.strength * (T - 1))), 1)
    if (args.inpaint_image is None) != (args.inpaint_mask is None):
        parser.error("inpainting needs BOTH --inpaint-image and --inpaint-mask")
    if args.inpaint_image:
        if args.sampler == "dpmpp":
            parser.error("inpainting requires --sampler ddpm or ddim")
        x_known = load_image28(args.inpaint_image)
        mask = (load_image28(args.inpaint_mask) >= 0.0).astype(np.float32)

    # The schedule and training target come from the sidecar: a checkpoint
    # trained with --noise-schedule cosine or --prediction v must be served
    # with matching sampler math.
    sampler = make_sampler(
        model, schedule, (args.n, 28, 28, 1), conditional=conditional,
        dtype=resolve_dtype(args.sample_dtype),
        method=args.sampler, sample_steps=args.sample_steps, eta=args.eta,
        guidance_scale=args.guidance_scale,
        null_label=num_classes if cfg_trained else None,
        prediction=cfg.get("prediction", "eps"),
        t_start=t_start, mask=mask, x_known=x_known,
    )
    key = jax.random.PRNGKey(args.seed)
    x_init = None
    if args.init_image:
        x0 = jnp.broadcast_to(
            jnp.asarray(load_image28(args.init_image)), (args.n, 28, 28, 1)
        )
        key, noise_key = jax.random.split(key)
        noise = jax.random.normal(noise_key, x0.shape)
        t_vec = jnp.full((args.n,), t_start, jnp.int32)
        x_init = q_sample_with_noise(schedule, x0, t_vec, noise)
        print(f"img2img from {args.init_image} at t_start={t_start} "
              f"(strength {args.strength})")
    labels = None
    if conditional:
        if args.digit is not None:
            y = jnp.full((args.n,), args.digit, jnp.int32)
        else:
            key, y_key = jax.random.split(key)
            y = jax.random.randint(y_key, (args.n,), 0, num_classes)
        labels = np.asarray(y)
        samples = sampler(params, state.batch_stats, key, y=y, x_init=x_init)
    else:
        samples = sampler(params, state.batch_stats, key, x_init=x_init)

    images = np.asarray(jax.device_get((samples + 1) / 2), np.float32)
    nrow = max(int(np.sqrt(args.n)), 1)
    save_image_grid(images, args.out, nrow=nrow, labels=labels)
    print(f"wrote {args.n} samples to {args.out}")


if __name__ == "__main__":
    main()
