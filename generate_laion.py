"""Standalone text-to-image serving from a trained LAION diffusion checkpoint.

The reference has no serving entry point at all — images only ever come out
of its training loop (/root/reference/conditional_diffusion_laion.py:560-599).
This CLI restores any checkpoint written by ``conditional_diffusion_laion.py``
(weights + EMA shadow + persisted codec basis + config, all from the Orbax
state and its JSON sidecar), encodes arbitrary ``--prompt`` strings with the
checkpoint's own text encoder, and samples with DDPM or the accelerated
DDIM path, optionally with classifier-free guidance for caption-dropout
checkpoints.

    python generate_laion.py --checkpoint checkpoints/laion_diffusion_best \
        --prompt "a photo of a cat" --prompt "a photo of a dog" \
        --sampler ddim --sample-steps 50
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help="path written by conditional_diffusion_laion.py "
                             "(Orbax dir + .json sidecar)")
    parser.add_argument("--prompt", action="append", default=None,
                        help="repeatable; defaults to the experiment's four "
                             "fixed sample prompts")
    parser.add_argument("--out", default="laion_generated.png")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--sampler", choices=["ddpm", "ddim"], default="ddpm",
                        help="ddpm = faithful T-step chain; ddim = "
                             "accelerated serving path")
    parser.add_argument("--sample-steps", type=int, default=50,
                        help="DDIM model forwards (ignored for ddpm)")
    parser.add_argument("--eta", type=float, default=0.0,
                        help="DDIM stochasticity (0 = deterministic)")
    parser.add_argument("--guidance-scale", type=float, default=1.0,
                        help="classifier-free guidance (checkpoints trained "
                             "with --caption-dropout only; 1 = off)")
    parser.add_argument("--sample-dtype", default=None,
                        help="override the sidecar's sample dtype")
    parser.add_argument("--dump-dir", default=None,
                        help="also write every sample as an individual PNG "
                             "(feeds tools/fid_eval_laion.py --samples-dir)")
    parser.add_argument("--repeat", type=int, default=1,
                        help="with --dump-dir: sample this many batches "
                             "(seeds seed..seed+repeat-1; one compiled "
                             "program, shapes unchanged)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from tinydiffusion_tpu.compat.latent_codec import get_latent_codec
    from tinydiffusion_tpu.compat.text_encoder import get_text_encoder
    from tinydiffusion_tpu.core.schedule import DiffusionSchedule
    from tinydiffusion_tpu.experiments.common import resolve_dtype
    from tinydiffusion_tpu.experiments.conditional_diffusion_laion import (
        SAMPLE_PROMPTS,
        cosine_annealing_lr,
        make_laion_sampler,
    )
    from tinydiffusion_tpu.io.checkpoint import load_sidecar, restore_checkpoint
    from tinydiffusion_tpu.models.unet_latent import LatentUNet
    from tinydiffusion_tpu.obs.images import save_image_grid
    from tinydiffusion_tpu.train.trainer import create_train_state

    sidecar = load_sidecar(args.checkpoint)
    cfg, meta = sidecar.get("config", {}), sidecar.get("metadata", {})
    time_dim = int(cfg.get("time_dim", 768))
    latent_size = int(cfg.get("latent_size", 32))
    latent_channels = int(cfg.get("latent_channels", 4))
    batch_size = int(cfg.get("batch_size", 8))
    T = int(cfg.get("num_timesteps", 1000))
    image_size = int(cfg.get("image_size", 256))

    cfg_trained = float(cfg.get("caption_dropout", 0.0)) > 0
    if args.guidance_scale != 1.0 and not cfg_trained:
        parser.error(
            "--guidance-scale needs a checkpoint trained with "
            "--caption-dropout > 0 (the null conditioning was never trained)"
        )

    # The checkpoint's own seams: codec in the persisted calibrated basis,
    # text encoder of the kind it trained with ('auto' resolved the offline
    # way the experiment does).
    codec_name = cfg.get("latent_codec", "auto")
    encoder_name = cfg.get("text_encoder", "auto")
    if cfg.get("offline", True):
        codec_name = "patch" if codec_name == "auto" else codec_name
        if encoder_name == "auto":
            encoder_name = "clip" if cfg.get("clip_local_dir") else "hash"
    codec = get_latent_codec(codec_name, image_size)
    if hasattr(codec, "load_state_dict"):
        codec_state = meta.get("codec_state")
        if codec_state is None:
            parser.error(
                "checkpoint sidecar has no codec_state — the denoiser's "
                "latent basis is unrecoverable (re-save from a run that "
                "persists it)"
            )
        codec.load_state_dict(codec_state)
    text_encoder = get_text_encoder(encoder_name, time_dim,
                                    cfg.get("clip_local_dir", ""))

    prompts = args.prompt or list(SAMPLE_PROMPTS)
    embeds = jnp.asarray(text_encoder.encode(prompts).astype(np.float32))
    null_embed = (
        jnp.asarray(text_encoder.encode([""])[0].astype(np.float32))
        if cfg_trained else None
    )

    model = LatentUNet(time_dim=time_dim, in_channels=latent_channels,
                       dtype=resolve_dtype(cfg.get("compute_dtype", "bfloat16")))
    use_ema = float(cfg.get("ema_decay", 0.0)) > 0
    example = (
        jnp.zeros((batch_size, latent_size, latent_size, latent_channels),
                  jnp.float32),
        jnp.zeros((batch_size,), jnp.int32),
        jnp.zeros((batch_size, time_dim), jnp.float32),
    )
    # The template's optimizer tree must match the experiment's exactly
    # (chain(clip, adam(schedule)) — Orbax restores by structure).
    t_max = max(int(cfg.get("scheduler_t_max", 0) or cfg.get("num_epochs", 1000)), 1)
    tx = optax.chain(
        optax.clip_by_global_norm(float(cfg.get("clip_norm", 10.0))),
        optax.adam(cosine_annealing_lr(float(cfg.get("lr", 1e-4)),
                                       float(cfg.get("lr_min", 1e-6)), t_max)),
    )
    template = create_train_state(
        model, tx, example, jax.random.PRNGKey(0), ema=use_ema
    )
    state = restore_checkpoint(args.checkpoint, template)
    params = state.ema_params if use_ema else state.params
    print(f"loaded {args.checkpoint} (step {int(state.step)}"
          + (", sampling from EMA params)" if use_ema else ")"))

    schedule = DiffusionSchedule.linear(T)
    sample_dtype = resolve_dtype(
        args.sample_dtype or cfg.get("sample_dtype", "float32")
    )
    sampler = make_laion_sampler(
        model, schedule, codec, len(prompts), latent_size, latent_channels,
        sample_dtype, guidance_scale=args.guidance_scale,
        null_embed=null_embed, method=args.sampler,
        sample_steps=args.sample_steps, eta=args.eta,
    )
    imgs = sampler(params, state.batch_stats, jax.random.PRNGKey(args.seed),
                   embeds)
    nrow = max(int(np.ceil(np.sqrt(len(prompts)))), 1)
    save_image_grid(np.asarray(imgs), args.out, nrow=nrow, normalize=False,
                    labels=prompts)
    print(f"wrote {len(prompts)} samples to {args.out}")

    if args.dump_dir:
        import os

        from PIL import Image

        os.makedirs(args.dump_dir, exist_ok=True)
        n_written = 0
        for r in range(args.repeat):
            batch = imgs if r == 0 else sampler(
                params, state.batch_stats,
                jax.random.PRNGKey(args.seed + r), embeds,
            )
            for i, im in enumerate(np.asarray(batch)):
                arr = (np.clip(im, 0.0, 1.0) * 255).astype(np.uint8)
                Image.fromarray(arr, mode="RGB").save(
                    os.path.join(args.dump_dir, f"sample_{r:03d}_{i:02d}.png")
                )
                n_written += 1
            print(f"dumped batch {r + 1}/{args.repeat}")
        print(f"wrote {n_written} individual PNGs to {args.dump_dir}")


if __name__ == "__main__":
    main()
