"""Text-conditional latent diffusion on LAION-style data — parity with
reference conditional_diffusion_laion.py.

Reference recipe (conditional_diffusion_laion.py:360-557, 602-667):
- frozen SD-VAE latent codec (4x32x32, scaling factor) and CLIP-L text
  embeddings (last token, 768-d) — both replaced offline by documented
  substitutes behind the same seams (compat/latent_codec.py,
  compat/text_encoder.py);
- resume weights from the best checkpoint if present (376-383);
- precache + valid-subset + 80/20 split (403-433);
- Adam 1e-4, CosineAnnealingLR to 1e-6 with T_max=num_epochs stepped PER
  BATCH (a faithful quirk: the reference steps an epoch-scaled scheduler
  every batch, 434-438, 473 — and torch's recursion is PERIODIC past
  T_max, so long runs see the lr oscillate lr→lr_min→lr with period
  2*T_max steps), grad-norm clip 10 (471);
- batch loss logged every 10 batches; full 1000-step sample every 100
  batches and per epoch on 4 fixed prompts (479-496, 531-538);
- per-epoch val pass, best-val checkpoint (499-530);
- sampling decodes latents then ``(x/2+0.5).clamp(0,1)`` + NaN/Inf scrub
  (589-598).

TPU-native: text embeddings and codec-encode are folded into the jitted
train step's input side; the sampler is the single-scan chain with the
decode tail inside the same program. Text embeddings for repeated prompts
are cached (the reference re-encodes every batch — SURVEY.md §3.4 flags
this as a hot spot).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinydiffusion_tpu.compat.latent_codec import get_latent_codec
from tinydiffusion_tpu.compat.text_encoder import get_text_encoder
from tinydiffusion_tpu.core.sampler import ddim_sample, ddpm_sample
from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.data.laion import (
    LAIONImageTextDataset,
    load_laion_dataset,
    precache_dataset,
)
from tinydiffusion_tpu.data.loader import BatchIterator, prefetch_to_device
from tinydiffusion_tpu.experiments.common import resolve_dtype
from tinydiffusion_tpu.io.checkpoint import BestKeeper, checkpoint_exists, restore_checkpoint
from tinydiffusion_tpu.models.unet_latent import LatentUNet
from tinydiffusion_tpu.obs.images import save_image_grid
from tinydiffusion_tpu.obs.metrics import LossAccumulator, MetricsLogger, Throughput
from tinydiffusion_tpu.parallel.mesh import batch_sharding, make_mesh_for_batch
from tinydiffusion_tpu.train.trainer import DiffusionTrainState, create_train_state


@dataclasses.dataclass
class LaionDiffusionConfig:
    num_epochs: int = 1000
    batch_size: int = 8
    lr: float = 1e-4
    lr_min: float = 1e-6
    clip_norm: float = 10.0
    num_timesteps: int = 1000
    time_dim: int = 768
    image_size: int = 256
    latent_size: int = 32
    latent_channels: int = 4
    n_records: int = 10_000
    seed: int = 0
    split_seed: int = 42
    out_dir: str = "runs/conditional_diffusion_laion"
    image_cache_dir: str = "data/laion"
    failed_urls_cache: str = "data/failed_urls.json"
    model_save_path: str = "checkpoints/laion_diffusion_best"
    text_encoder: str = "auto"  # 'clip' | 'hash' | 'auto'
    # Directory with clip_text.pth + vocab.json + merges.txt: builds the
    # CLIP seam fully offline, tokenizer included (compat/clip_tokenizer).
    clip_local_dir: str = ""
    latent_codec: str = "auto"  # 'sd' | 'patch' | 'auto'
    compute_dtype: str = "bfloat16"
    # fp32 sampling: a 1000-step bf16 chain visibly degrades samples.
    sample_dtype: str = "float32"
    use_mesh: bool = True
    log_every: int = 10
    sample_every_batches: int = 100
    sample_every_epoch: bool = True
    # Epoch stride for the epoch-end sample grid: sample when
    # (epoch + 1) % sample_every_epochs == 0. 1 = the reference's
    # every-epoch cadence; long runs (the published 1000-epoch recipe,
    # conditional_diffusion_laion.py:632) set this to ~100 so a thousand
    # 1000-step sampling chains don't dominate wall-clock. The final grid
    # is always emitted regardless.
    sample_every_epochs: int = 1
    offline: bool = True
    max_steps_per_epoch: int = 0
    # Cosine T_max in scheduler STEPS (the reference quirk steps an
    # epoch-scaled scheduler per batch, T_max=num_epochs,
    # conditional_diffusion_laion.py:435-438/473). 0 = num_epochs (faithful).
    # Setting it explicitly lets a shorter run keep the reference's
    # T_max=1000 lr trajectory instead of compressing the decay.
    scheduler_t_max: int = 0
    # K training batches per device dispatch (lax.scan inside one jitted
    # program) — amortizes the ~1 ms per-dispatch tunnel RTT that dominates
    # this tiny latent-UNet step. 1 = reference-faithful per-batch dispatch.
    # Setting it to log_every keeps the batch-loss logging cadence identical.
    steps_per_dispatch: int = 1
    # EMA shadow of the params, updated in the jitted step and preferred for
    # sampling when set (e.g. 0.999). 0 = off (reference-faithful).
    ema_decay: float = 0.0
    # Classifier-free guidance for text conditioning (the production
    # text-to-image recipe; no reference counterpart). caption_dropout > 0
    # (e.g. 0.1) trains with text embeddings randomly replaced by the
    # encoder's empty-string embedding; guidance_scale != 1 then samples
    # with eps = eps_null + s*(eps_text - eps_null) — one doubled-batch
    # forward per chain step.
    caption_dropout: float = 0.0
    guidance_scale: float = 1.0
    # 'host' streams batches through the prefetch pipeline; 'device' pins
    # the uint8 images + text embeddings in HBM (1.9 GB at the full 256^2
    # 10k recipe) and scans steps_per_dispatch-sized index groups per
    # dispatch — per-batch image upload disappears. 'auto' (default)
    # promotes to 'device' when the set fits in HBM. DP-capable.
    data_placement: str = "auto"


SAMPLE_PROMPTS = [
    "a photo of a cat",
    "a photo of a dog",
    "a photo of a horse",
    "a photo of a cow",
]


def cosine_annealing_lr(lr: float, lr_min: float, t_max: int):
    """Torch-exact ``CosineAnnealingLR``: eta_min + (lr - eta_min) *
    (1 + cos(pi * t / T_max)) / 2 at every integer step t.

    Deliberately NOT clamped past T_max: torch's recursion is periodic
    (period 2*T_max), so the reference's published 1000-epoch recipe —
    T_max=num_epochs=1000 scheduler STEPS, stepped PER BATCH
    (conditional_diffusion_laion.py:435-438, 473, 632) — crosses T_max
    inside epoch 2 and spends the remaining ~999 epochs on a
    full-amplitude lr oscillation between lr and lr_min. Clamping at
    lr_min (optax.cosine_decay_schedule semantics) would be a different
    training run. Parity: tests/test_torch_parity_ops.py."""

    def schedule(step):
        cos_term = 0.5 * (1.0 + jnp.cos(jnp.pi * step / t_max))
        return lr_min + (lr - lr_min) * cos_term

    return schedule


def _laion_raw_step(model, tx, schedule, codec, ema_decay=None,
                    caption_dropout: float = 0.0, null_embed=None):
    """The unjitted per-batch LAION step, shared by the single-dispatch,
    K-dispatch, and HBM-resident wrappers.

    ``caption_dropout`` > 0 replaces each text embedding row with
    ``null_embed`` (the encoder's empty-string embedding) at that probability
    — classifier-free-guidance training for text conditioning (the
    production text-to-image recipe; no reference counterpart). The PRNG
    split changes only when the feature is on, so default-path noise streams
    stay bitwise-identical. ``ema_decay`` updates the state's EMA shadow
    (see train.trainer._ema_update; requires create_train_state(ema=True))."""
    if caption_dropout > 0 and null_embed is None:
        raise ValueError("caption_dropout requires a null_embed")
    from tinydiffusion_tpu.train.trainer import _ema_update

    def step_fn(state: DiffusionTrainState, images, text_embeds):
        if caption_dropout > 0:
            rng, t_key, noise_key, enc_key, cdrop_key = jax.random.split(
                state.rng, 5
            )
            keep = jax.random.bernoulli(
                cdrop_key, 1.0 - caption_dropout, (text_embeds.shape[0],)
            )
            text_embeds = jnp.where(
                keep[:, None], text_embeds,
                null_embed[None, :].astype(text_embeds.dtype),
            )
        else:
            rng, t_key, noise_key, enc_key = jax.random.split(state.rng, 4)
        # Stochastic encode (the reference's latent_dist.sample(),
        # conditional_diffusion_laion.py:460-461); deterministic codecs
        # (LinearPatchCodec) ignore the key.
        latents = codec.encode(images, key=enc_key)
        batch = latents.shape[0]
        t = jax.random.randint(t_key, (batch,), 0, schedule.num_timesteps)
        from tinydiffusion_tpu.core.process import q_sample

        x_t, noise = q_sample(schedule, latents, t, noise_key)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x_t, t, text_embeds, train=True, mutable=["batch_stats"],
            )
            return jnp.mean((out - noise) ** 2), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt, rng=rng,
                          ema_params=_ema_update(state, new_params, ema_decay)),
            loss,
        )

    return step_fn


def make_laion_train_step(model, tx, schedule, codec, mesh=None,
                          steps_per_dispatch: int = 1, ema_decay=None,
                          caption_dropout: float = 0.0, null_embed=None):
    """Jitted step over (images, text_embeds): codec-encode -> q_sample ->
    UNet -> clipped Adam update, one SPMD program.

    ``steps_per_dispatch`` > 1 returns a multi-step program instead:
    ``step(state, images_k, embeds_k) -> (state, losses_k)`` scanning K
    stacked batches inside ONE dispatch (leading axis K) — amortizes the
    ~5-6 ms per-dispatch host-tunnel overhead (see
    train.trainer.make_multi_step for the equivalence argument)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    step_fn = _laion_raw_step(model, tx, schedule, codec, ema_decay=ema_decay,
                              caption_dropout=caption_dropout,
                              null_embed=null_embed)

    if steps_per_dispatch > 1:
        def fn(state, images_k, embeds_k):
            def body(s, xe):
                s2, loss = step_fn(s, xe[0], xe[1])
                return s2, loss

            return jax.lax.scan(body, state, (images_k, embeds_k))

        data_spec = P(None, "data")  # (K, B, ...) — batch dim is axis 1
    else:
        fn, data_spec = step_fn, P("data")

    if mesh is None:
        return jax.jit(fn, donate_argnums=0)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, data_spec)
    return jax.jit(fn, donate_argnums=0,
                   in_shardings=(repl, data, data), out_shardings=(repl, repl))


def make_laion_resident_step(model, tx, schedule, codec, dataset, mesh=None,
                             ema_decay=None, caption_dropout: float = 0.0,
                             null_embed=None):
    """HBM-resident LAION training: ``step(state, idxs) -> (state, losses)``
    with ``idxs`` (K, B) int32. The 10k-image uint8 set at 256^2 is 1.9 GB
    — pinned once in HBM (data/device.DeviceDataset) so the per-batch
    1.6 MB image upload disappears; gather + u8-normalize + codec-encode +
    train scan in one program. Under a ``mesh`` index batches shard over
    ``data`` against the replicated pinned set (train.trainer.resident_jit)."""
    from tinydiffusion_tpu.train.trainer import resident_jit

    single = _laion_raw_step(model, tx, schedule, codec, ema_decay=ema_decay,
                             caption_dropout=caption_dropout,
                             null_embed=null_embed)

    def step_fn(arrays, state: DiffusionTrainState, idxs):
        def body(s, idx):
            # arrays enter as explicit args — see gather_arrays docstring.
            images, embeds = dataset.gather_arrays(arrays, idx)
            s2, loss = single(s, images, embeds)
            return s2, loss

        return jax.lax.scan(body, state, idxs)

    return resident_jit(step_fn, dataset, mesh)


def _window_contains_multiple(lo: int, hi: int, every: int,
                              positive_only: bool = False) -> bool:
    """True iff the inclusive batch-index window [lo, hi] contains a multiple
    of ``every`` — the exact K-dispatch generalization of the reference's
    per-batch ``batch_idx % every == 0`` gates (so a window overlapping a
    log point fires exactly once, whatever K divides into ``every``)."""
    if every <= 0:
        return False
    if positive_only:
        lo = max(lo, 1)
        if hi < 1:
            return False
    return hi // every > (lo - 1) // every


def make_laion_eval_step(model, schedule, codec, mesh=None):
    from jax.sharding import NamedSharding, PartitionSpec as P

    def step_fn(params, batch_stats, images, text_embeds, key):
        t_key, noise_key, enc_key = jax.random.split(key, 3)
        latents = codec.encode(images, key=enc_key)
        batch = latents.shape[0]
        t = jax.random.randint(t_key, (batch,), 0, schedule.num_timesteps)
        from tinydiffusion_tpu.core.process import q_sample

        x_t, noise = q_sample(schedule, latents, t, noise_key)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          x_t, t, text_embeds, train=False)
        return jnp.mean((out - noise) ** 2)

    if mesh is None:
        return jax.jit(step_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step_fn, in_shardings=(repl, repl, data, data, repl),
                   out_shardings=repl)


def make_laion_sampler(model, schedule, codec, n_samples, latent_size,
                       latent_channels, dtype, guidance_scale: float = 1.0,
                       null_embed=None, method: str = "ddpm",
                       sample_steps: int = 50, eta: float = 0.0):
    """1000-step chain + decode + (x/2+0.5).clamp + NaN/Inf scrub, one
    program (conditional_diffusion_laion.py:560-599).

    ``guidance_scale`` != 1 (models trained with ``caption_dropout``;
    requires ``null_embed``, the empty-string embedding) samples with
    classifier-free guidance: ``eps = eps_null + s*(eps_text - eps_null)``,
    both predictions from ONE doubled-batch forward per chain step.

    ``method='ddim'`` is the accelerated serving path (``sample_steps``
    model forwards instead of T; deterministic at ``eta=0``) — same
    checkpoint, no retraining (core/sampler.ddim_sample)."""
    if method not in ("ddpm", "ddim"):
        raise ValueError(f"unknown sampler method {method!r}; use 'ddpm' or 'ddim'")
    guided = guidance_scale != 1.0
    if guided and null_embed is None:
        raise ValueError(
            "guidance_scale != 1 needs null_embed (a model trained with "
            "caption_dropout; the empty-string embedding)"
        )

    @jax.jit
    def sample_fn(params, batch_stats, key, text_embeds):
        def apply_fn(x, t_vec):
            variables = {"params": params, "batch_stats": batch_stats}
            if guided:
                x2 = jnp.concatenate([x, x])
                t2 = jnp.concatenate([t_vec, t_vec])
                e2 = jnp.concatenate([
                    text_embeds,
                    jnp.broadcast_to(
                        null_embed[None, :].astype(text_embeds.dtype),
                        text_embeds.shape,
                    ),
                ])
                eps2 = model.apply(variables, x2, t2, e2, train=False)
                eps_t, eps_n = jnp.split(eps2, 2)
                return eps_n + guidance_scale * (eps_t - eps_n)
            return model.apply(variables, x, t_vec, text_embeds, train=False)

        shape = (n_samples, latent_size, latent_size, latent_channels)
        if method == "ddim":
            latents = ddim_sample(apply_fn, schedule, shape, key,
                                  num_steps=sample_steps, eta=eta, dtype=dtype)
        else:
            latents = ddpm_sample(apply_fn, schedule, shape, key, dtype=dtype)
        decoded = codec.decode(latents.astype(jnp.float32))
        images = jnp.clip(decoded / 2 + 0.5, 0.0, 1.0)
        images = jnp.where(jnp.isfinite(images), images, jnp.zeros_like(images))
        return images

    return sample_fn


def run(config: LaionDiffusionConfig) -> dict:
    dtype = resolve_dtype(config.compute_dtype)
    rng = jax.random.PRNGKey(config.seed)

    # In offline mode resolve 'auto' straight to the substitutes — probing
    # the HF hub first costs minutes of connect retries with zero egress.
    codec_name = config.latent_codec
    encoder_name = config.text_encoder
    if config.offline:
        codec_name = "patch" if codec_name == "auto" else codec_name
        if encoder_name == "auto":
            encoder_name = "clip" if config.clip_local_dir else "hash"
    codec = get_latent_codec(codec_name, config.image_size)
    text_encoder = get_text_encoder(encoder_name, config.time_dim,
                                    config.clip_local_dir)

    # Data: precache + valid subset + split (conditional_diffusion_laion.py:403-433).
    records = load_laion_dataset(config.n_records, offline=config.offline)
    ds = LAIONImageTextDataset(
        records, cache_dir=config.image_cache_dir,
        failed_urls_cache=config.failed_urls_cache,
        image_size=config.image_size, normalize=True, on_error="raise",
        as_uint8=True,  # batch-time normalize via the native fused loader
    )
    valid = precache_dataset(ds)
    if not valid:
        raise RuntimeError("No valid samples after pre-caching!")
    print(f"Using {len(valid)} valid samples for training.")

    items = [ds[i] for i in valid]
    images = np.stack([x for x, _ in items])
    texts = [t for _, t in items]
    embeds = text_encoder.encode(texts).astype(np.float32)

    # Unit-variance latent calibration for the substitute codec (the real
    # SD-VAE ships a pre-calibrated scaling_factor; see
    # LinearPatchCodec.calibrate). A resumed run must keep the basis the
    # checkpointed denoiser was trained in — restore it from the sidecar
    # instead of re-fitting on this run's (possibly different) data.
    if hasattr(codec, "calibrate"):
        codec_state = None
        if checkpoint_exists(config.model_save_path):
            from tinydiffusion_tpu.io.checkpoint import load_sidecar

            try:
                codec_state = load_sidecar(config.model_save_path).get(
                    "metadata", {}
                ).get("codec_state")
            except Exception as e:
                print(f"Could not read codec state from sidecar: {e}")
        if codec_state is not None:
            codec.load_state_dict(codec_state)
            print(f"restored calibrated codec basis from "
                  f"{config.model_save_path} (scaling factor "
                  f"{codec.scaling_factor:.4f})")
        else:
            sample = images[: min(64, len(images))].astype(np.float32) * (2 / 255) - 1
            sf = codec.calibrate(jnp.asarray(sample))
            print(f"calibrated latent scaling factor: {sf:.4f}")

    perm = np.random.default_rng(config.split_seed).permutation(len(images))
    n_val = len(images) // 5
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    u8 = (2.0 / 255.0, -1.0)  # ToTensor + Normalize(0.5x3): [-1, 1]
    train_it = BatchIterator([images[train_idx], embeds[train_idx]],
                             config.batch_size, shuffle=True, seed=config.seed,
                             u8_normalize=u8, device_normalize=True)
    val_it = BatchIterator([images[val_idx], embeds[val_idx]],
                           config.batch_size, shuffle=False, u8_normalize=u8,
                           device_normalize=True)

    schedule = DiffusionSchedule.linear(config.num_timesteps)
    model = LatentUNet(time_dim=config.time_dim,
                       in_channels=config.latent_channels, dtype=dtype)

    t_max = max(config.scheduler_t_max or config.num_epochs, 1)
    tx = optax.chain(
        optax.clip_by_global_norm(config.clip_norm),
        optax.adam(cosine_annealing_lr(config.lr, config.lr_min, t_max)),
    )

    rng, init_rng = jax.random.split(rng)
    example = (
        jnp.zeros((config.batch_size, config.latent_size, config.latent_size,
                   config.latent_channels), jnp.float32),
        jnp.zeros((config.batch_size,), jnp.int32),
        jnp.zeros((config.batch_size, config.time_dim), jnp.float32),
    )
    use_ema = config.ema_decay > 0
    ema_decay = config.ema_decay if use_ema else None
    state = create_train_state(model, tx, example, init_rng, ema=use_ema)

    # CFG: the null conditioning is the encoder's empty-string embedding
    # (the production text-to-image convention — no reserved row needed).
    use_cfg = config.caption_dropout > 0 or config.guidance_scale != 1.0
    null_embed = (
        jnp.asarray(text_encoder.encode([""])[0].astype(np.float32))
        if use_cfg else None
    )

    # Resume from best checkpoint if present (conditional_diffusion_laion.py:376-383).
    if checkpoint_exists(config.model_save_path):
        try:
            state = restore_checkpoint(config.model_save_path, state)
            print(f"Loaded model weights from {config.model_save_path}")
        except Exception as e:
            print(f"Error loading model from {config.model_save_path}: {e}; "
                  "starting from scratch")

    mesh = make_mesh_for_batch(config.batch_size) if config.use_mesh else None
    k_dispatch = max(config.steps_per_dispatch, 1)
    from tinydiffusion_tpu.experiments.common import resolve_data_placement

    resident = resolve_data_placement(
        config.data_placement,
        images[train_idx].nbytes + embeds[train_idx].nbytes,
        config.batch_size, mesh, "laion",
    )
    if resident:
        from tinydiffusion_tpu.data.device import DeviceDataset
        from tinydiffusion_tpu.parallel.mesh import replicated_sharding

        device_data = DeviceDataset(
            [images[train_idx], embeds[train_idx]], config.batch_size,
            shuffle=True, seed=config.seed, u8_normalize=u8,
            sharding=replicated_sharding(mesh) if mesh is not None else None,
        )
        resident_step = make_laion_resident_step(
            model, tx, schedule, codec, device_data, mesh=mesh,
            ema_decay=ema_decay, caption_dropout=config.caption_dropout,
            null_embed=null_embed,
        )
        # Pinned val split: the whole val pass in one dispatch per epoch
        # with the host loop's exact fold_in key cadence (VERDICT r2 weak #8).
        from tinydiffusion_tpu.train.trainer import make_resident_eval

        device_val = DeviceDataset(
            [images[val_idx], embeds[val_idx]], config.batch_size,
            shuffle=False, u8_normalize=u8,
            sharding=replicated_sharding(mesh) if mesh is not None else None,
        )

        def _val_body(ctx, batch, key):
            params, batch_stats = ctx
            t_key, noise_key, enc_key = jax.random.split(key, 3)
            latents = codec.encode(batch[0], key=enc_key)
            t = jax.random.randint(
                t_key, (latents.shape[0],), 0, schedule.num_timesteps
            )
            from tinydiffusion_tpu.core.process import q_sample

            x_t, noise = q_sample(schedule, latents, t, noise_key)
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x_t, t, batch[1], train=False,
            )
            return jnp.mean((out - noise) ** 2)

        resident_eval = make_resident_eval(
            _val_body, device_val, jax.random.PRNGKey(config.seed + 3),
            mesh=mesh,
        )
    cfg_kw = dict(ema_decay=ema_decay, caption_dropout=config.caption_dropout,
                  null_embed=null_embed)
    train_step = make_laion_train_step(model, tx, schedule, codec, mesh,
                                       steps_per_dispatch=k_dispatch, **cfg_kw)
    # Tail batches that don't fill a K-group run through the per-batch
    # program (compiled once, reused every epoch).
    single_step = (
        train_step if k_dispatch == 1
        else make_laion_train_step(model, tx, schedule, codec, mesh, **cfg_kw)
    )
    eval_step = make_laion_eval_step(model, schedule, codec, mesh)
    sampler = make_laion_sampler(
        model, schedule, codec, len(SAMPLE_PROMPTS), config.latent_size,
        config.latent_channels, resolve_dtype(config.sample_dtype),
        guidance_scale=config.guidance_scale, null_embed=null_embed,
    )
    sample_embeds = jnp.asarray(text_encoder.encode(SAMPLE_PROMPTS))

    # Sampling prefers the EMA shadow when it exists (generate-time params).
    def _sample_params(s):
        return s.ema_params if use_ema else s.params

    logger = MetricsLogger("laion-diffusion-model", config.out_dir,
                           dataclasses.asdict(config))
    keeper = BestKeeper(config.model_save_path)
    throughput = Throughput()
    result = {"val_losses": [], "samples_per_sec": 0.0}

    batch_sh = batch_sharding(mesh) if mesh is not None else None
    for epoch in range(config.num_epochs):
        throughput.reset()
        train_acc = LossAccumulator()
        if resident:
            # HBM-resident epoch: index-group dispatches, no image H2D.
            idxs_np = device_data.epoch_index_batches(epoch)
            if config.max_steps_per_epoch:
                idxs_np = idxs_np[: config.max_steps_per_epoch]
            g = max(k_dispatch, config.log_every)
            for start in range(0, len(idxs_np), g):
                chunk = jnp.asarray(idxs_np[start : start + g])
                state, losses = resident_step(state, chunk)
                # One bulk fetch per group (per-element losses[j] slicing
                # spawns a tiny device program per element).
                host_losses = np.asarray(jax.device_get(losses))
                train_acc.add_many(host_losses)
                throughput.add(chunk.shape[0] * config.batch_size)
                end = start + int(chunk.shape[0]) - 1
                # The scanned (K,) losses let the reference's exact
                # per-log_every batch-loss cadence survive K-batch
                # dispatches: every log point inside the window is emitted
                # with ITS batch's loss.
                for j in range(int(chunk.shape[0])):
                    if (start + j) % config.log_every == 0:
                        logger.log({"epoch": epoch, "batch": start + j,
                                    "batch_train_loss": float(host_losses[j])})
                # Mid-epoch sampling (conditional_diffusion_laion.py:479-496)
                # fires at the first dispatch boundary past each
                # sample_every_batches multiple — the state inside a window
                # is never materialized, so the grid reflects the
                # end-of-window params (documented cadence shift < g).
                if _window_contains_multiple(
                    start, end, config.sample_every_batches, positive_only=True
                ):
                    rng, s_key = jax.random.split(rng)
                    imgs = sampler(_sample_params(state), state.batch_stats, s_key,
                                   sample_embeds)
                    path = f"{config.out_dir}/sampled_epoch{epoch}_batch{end}.png"
                    save_image_grid(np.asarray(imgs), path, nrow=2,
                                    normalize=False)
                    logger.log_image("sampled_images", path)
        else:
            batches = prefetch_to_device(
                train_it.epoch(epoch), sharding=batch_sh,
                transform=train_it.device_transform,
            )
            group: list = []

            def flush_group(state):
                xs = jnp.stack([g[0] for g in group])
                es = jnp.stack([g[1] for g in group])
                state, losses = train_step(state, xs, es)
                train_acc.add_many(losses)
                group.clear()
                return state

            for batch_idx, (x, emb) in enumerate(batches):
                if config.max_steps_per_epoch and batch_idx >= config.max_steps_per_epoch:
                    break
                if k_dispatch > 1:
                    group.append((x, emb))
                    if len(group) == k_dispatch:
                        state = flush_group(state)
                else:
                    state, loss = single_step(state, x, emb)
                    train_acc.add(loss)
                throughput.add(config.batch_size)
                dispatched = not group
                k_window = k_dispatch if k_dispatch > 1 else 1
                if dispatched and _window_contains_multiple(
                    batch_idx - k_window + 1, batch_idx, config.log_every
                ):
                    logger.log({"epoch": epoch, "batch": batch_idx,
                                "batch_train_loss": train_acc.last()})
                if dispatched and _window_contains_multiple(
                    batch_idx - k_window + 1, batch_idx,
                    config.sample_every_batches, positive_only=True,
                ):
                    rng, s_key = jax.random.split(rng)
                    imgs = sampler(_sample_params(state), state.batch_stats, s_key, sample_embeds)
                    path = f"{config.out_dir}/sampled_epoch{epoch}_batch{batch_idx}.png"
                    save_image_grid(np.asarray(imgs), path, nrow=2, normalize=False)
                    logger.log_image("sampled_images", path)
            for x, emb in group:  # tail that never filled a K-group
                state, loss = single_step(state, x, emb)
                train_acc.add(loss)
        # Single epoch-end fetch doubles as the completion fence (donated
        # chained state) — honest loop-level throughput.
        avg_train = train_acc.mean()
        result["samples_per_sec"] = throughput.samples_per_sec

        val_acc = LossAccumulator()
        if resident:
            vidxs = device_val.epoch_index_batches(0)
            if config.max_steps_per_epoch:
                vidxs = vidxs[: config.max_steps_per_epoch]
            if len(vidxs):
                for loss in np.asarray(resident_eval(
                    (state.params, state.batch_stats), epoch, vidxs
                )):
                    val_acc.add(loss)
        else:
            val_batches = prefetch_to_device(
                val_it.epoch(), sharding=batch_sh,
                transform=val_it.device_transform,
            )
            for i, (x, emb) in enumerate(val_batches):
                if config.max_steps_per_epoch and i >= config.max_steps_per_epoch:
                    break
                key = jax.random.fold_in(jax.random.PRNGKey(config.seed + 3),
                                         epoch * 10000 + i)
                val_acc.add(
                    eval_step(state.params, state.batch_stats, x, emb, key)
                )
        # Tiny configs can leave the val split with zero full batches; fall
        # back to train loss rather than recording a spurious 0.
        avg_val = val_acc.mean() if val_acc.count else avg_train
        result["val_losses"].append(avg_val)
        logger.log({"epoch": epoch, "epoch_train_loss": avg_train,
                    "val_loss": avg_val,
                    "train_samples_per_sec": throughput.samples_per_sec})
        extra_meta = (
            {"codec_state": codec.state_dict()}
            if hasattr(codec, "state_dict") else {}
        )
        if keeper.update(avg_val, state, config=dataclasses.asdict(config),
                         epoch=epoch, **extra_meta):
            print(f"Saved best model at epoch {epoch} with val loss: {avg_val:.4f}")

        if config.sample_every_epoch and (
            (epoch + 1) % max(1, config.sample_every_epochs) == 0
        ):
            rng, s_key = jax.random.split(rng)
            imgs = sampler(_sample_params(state), state.batch_stats, s_key, sample_embeds)
            save_image_grid(
                np.asarray(imgs), f"{config.out_dir}/samples_epoch_{epoch}.png",
                nrow=2, normalize=False, labels=SAMPLE_PROMPTS,
            )
            logger.log_image("samples", f"{config.out_dir}/samples_epoch_{epoch}.png")

    # Final sample grid on the fixed prompts regardless of the per-epoch
    # sampling flag (so headless training runs still leave an artifact).
    rng, s_key = jax.random.split(rng)
    imgs = sampler(_sample_params(state), state.batch_stats, s_key, sample_embeds)
    save_image_grid(
        np.asarray(imgs), f"{config.out_dir}/final_samples.png",
        nrow=2, normalize=False, labels=SAMPLE_PROMPTS,
    )
    logger.log_image("final_samples", f"{config.out_dir}/final_samples.png")

    result["state"] = state
    logger.finish()
    return result


def main(argv=None):
    import argparse

    from tinydiffusion_tpu.experiments.common import add_config_flags, config_from_args

    parser = argparse.ArgumentParser(description=__doc__)
    add_config_flags(parser, LaionDiffusionConfig())
    args = parser.parse_args(argv)
    from tinydiffusion_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    print(f"devices: {jax.devices()}")
    run(config_from_args(LaionDiffusionConfig, args))


if __name__ == "__main__":
    main()
