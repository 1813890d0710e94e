"""Benchmark harness — run on the real TPU chip by the driver.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: MNIST DDPM train samples/sec/chip at the reference recipe
(UNet28, batch 128, Adam, T=1000) — per BASELINE.json.

Honesty rules (round-2 fixes of VERDICT weak #1/#2/#6):
- sampling numbers are fp32 — the configuration every experiment ships
  (``sample_dtype="float32"``; a 1000-step bf16 chain visibly degrades
  samples). bf16 rides along explicitly labeled.
- ``train_samples_per_sec_loop`` measures the AS-EXPERIMENTS-RUN loop.
  Since round 3 the shipped default is ``data_placement='auto'`` which
  promotes to the HBM-resident path whenever the dataset fits (it always
  does for MNIST), so the loop number IS the resident epoch loop: index
  upload per epoch, scanned gather+normalize+step program, epoch-end
  fetch. ``train_samples_per_sec_loop_host`` is the explicit
  ``--data-placement host`` opt-out (host batch assembly, per-step
  transfer, shard_batch, log-cadence host syncs).
- Pallas kernels get a native self-check every bench run (flash attention
  fwd+bwd vs dense; fused q_sample closed-form identity + noise moments),
  so the driver-captured BENCH gates the kernels each round.
- all timings use the host-fetch fence (obs/profiling.force):
  ``jax.block_until_ready`` does not fence on this backend.

vs_baseline compares against the reference's PyTorch-CPU yardstick measured
with tools/measure_reference_baseline.py on this machine (the reference
publishes no numbers — BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinydiffusion_tpu.obs.profiling import force

from tinydiffusion_tpu.core.schedule import DiffusionSchedule
from tinydiffusion_tpu.experiments.common import make_sampler
from tinydiffusion_tpu.models.unet28 import UNet28
from tinydiffusion_tpu.parallel.mesh import make_mesh, shard_batch
from tinydiffusion_tpu.train.trainer import create_train_state, make_train_step

# Measured on this machine via tools/measure_reference_baseline.py
# (reference diffusion.py NoiseModel, torch 2.13 CPU 1-core, batch 128):
# {"train_samples_per_sec": 10.445, "sample_1000step_images_per_sec": 0.04263}
REFERENCE_CPU_TRAIN_SAMPLES_PER_SEC = 10.445
REFERENCE_CPU_SAMPLE_IMAGES_PER_SEC = 0.04263

BATCH = 128
TRAIN_STEPS = 30
N_SAMPLE_IMAGES = 16


def time_chained(step, state, x0, iters):
    """Time ``iters`` donated-state steps; force() fetch is the fence."""
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, x0)
    force(loss)
    return time.perf_counter() - t0, state


def kernel_selfchecks() -> dict:
    """Native Pallas kernel verification, executed on whatever backend the
    bench runs on (the driver runs it on the real TPU — VERDICT weak #2:
    the kernels previously had zero automated on-TPU coverage)."""
    checks = {}

    # --- flash attention fwd + bwd vs a HIGHEST-precision dense reference
    # (the production dense path runs default-precision matmuls whose own
    # bf16-pass error would otherwise be charged to the flash kernel).
    from tinydiffusion_tpu.ops.attention import flash_attention_unscaled

    hi = jax.lax.Precision.HIGHEST

    def _dense(q, k, v):
        logits = jnp.einsum(
            "bnd,bmd->bnm", q, k,
            preferred_element_type=jnp.float32, precision=hi,
        )
        attn = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "bnm,bmc->bnc", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32, precision=hi,
        )

    b, n, d, c = 2, 2048, 8, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(0.3 * rng.standard_normal((b, n, d)), jnp.float32)
    k = jnp.asarray(0.3 * rng.standard_normal((b, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

    out_flash = jax.jit(flash_attention_unscaled)(q, k, v)
    out_dense = jax.jit(_dense)(q, k, v)
    # Thresholds are regression tripwires (a broken kernel is O(1) off):
    # flash's value-side dots deliberately run default precision
    # (ops/attention.py), leaving ~1e-3 relative vs the HIGHEST reference.
    fwd_err = float(
        jnp.max(jnp.abs(out_flash - out_dense)) / (jnp.max(jnp.abs(out_dense)) + 1e-9)
    )
    checks["flash_fwd_ok"] = bool(fwd_err < 5e-3)
    checks["flash_fwd_relerr"] = round(fwd_err, 7)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_unscaled(q, k, v) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(_dense(q, k, v) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gd = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(q, k, v)
    bwd_err = max(
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        for a, b in zip(gf, gd)
    )
    checks["flash_bwd_ok"] = bool(bwd_err < 1e-2)
    checks["flash_bwd_relerr"] = round(bwd_err, 7)

    # --- fused q_sample: closed-form identity against its own noise, plus
    # N(0, I) moment checks on the in-kernel PRNG stream.
    from tinydiffusion_tpu.ops.qsample import q_sample_fused

    schedule = DiffusionSchedule.linear(1000)
    x0 = jnp.asarray(rng.standard_normal((64, 28, 28, 1)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 1000, size=(64,)), jnp.int32)
    xt, z = jax.jit(lambda x0, t: q_sample_fused(schedule, x0, t, 1234))(x0, t)
    sac = schedule.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
    s1m = schedule.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
    identity_err = float(jnp.max(jnp.abs(xt - (sac * x0 + s1m * z))))
    zn = np.asarray(z).ravel()
    checks["qsample_identity_err"] = round(identity_err, 7)
    checks["qsample_noise_mean"] = round(float(zn.mean()), 5)
    checks["qsample_noise_std"] = round(float(zn.std()), 5)
    checks["qsample_fused_ok"] = bool(
        identity_err < 1e-5 and abs(zn.mean()) < 0.02 and abs(zn.std() - 1) < 0.02
    )
    return checks


def zoo_loop_rates(schedule, tx, n_chips: int) -> dict:
    """Loop-level samples/sec for the conditional / latent / DiT recipes,
    measured as experiments/*.py run them (HBM-resident DeviceDataset,
    K-batch scanned dispatch). Throughput does not depend on weight values,
    so fresh inits stand in for trained checkpoints."""
    from tinydiffusion_tpu.data.device import DeviceDataset
    from tinydiffusion_tpu.models.dit import DiT
    from tinydiffusion_tpu.models.mlp_unet import MLPUNetLatent
    from tinydiffusion_tpu.models.vae_mnist import VAEMnist
    from tinydiffusion_tpu.train.trainer import (
        make_resident_latent_multi_step,
        make_resident_multi_step,
    )

    N_BATCHES = 25
    rngn = np.random.default_rng(3)
    x_u8 = rngn.integers(0, 256, (BATCH * N_BATCHES, 28, 28, 1), dtype=np.uint8)
    y_i = rngn.integers(0, 10, (BATCH * N_BATCHES,)).astype(np.int32)
    u8 = (2.0 / 255.0, -1.0)
    out = {}

    def run_loop(step_call, dds):
        # warmup chunk (compile) then 2 full timed epochs.
        _ = step_call(jnp.asarray(dds.epoch_index_batches(0)))
        n, t0 = 0, time.perf_counter()
        for ep in (1, 2):
            idxs = jnp.asarray(dds.epoch_index_batches(ep))
            loss = step_call(idxs)
            n += idxs.shape[0]
        force(loss)
        return n * BATCH / (time.perf_counter() - t0) / n_chips

    # conditional UNet28 (conditional_diffusion.py's resident loop)
    cond_model = UNet28(num_classes=10, dtype=jnp.bfloat16)
    dds_c = DeviceDataset([x_u8, y_i], BATCH, shuffle=True, seed=0,
                          u8_normalize=u8)
    step_c = make_resident_multi_step(cond_model, tx, schedule, dds_c,
                                      conditional=True)
    example_c = (jnp.zeros((BATCH, 28, 28, 1), jnp.float32),
                 jnp.zeros((BATCH,), jnp.int32), jnp.zeros((BATCH,), jnp.int32))
    state_c = create_train_state(cond_model, tx, example_c,
                                 jax.random.PRNGKey(21))
    holder = {"s": state_c}

    def call_c(idxs):
        holder["s"], losses = step_c(holder["s"], idxs)
        return losses

    out["conditional_samples_per_sec_loop"] = round(run_loop(call_c, dds_c), 1)

    # latent family (latent_diffusion.py / diffusion_transformer.py resident
    # loops: gather + normalize + frozen-VAE encode + update in-program)
    vae = VAEMnist()
    vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 28, 28, 1)),
                          jax.random.PRNGKey(2))["params"]
    example_l = (jnp.zeros((BATCH, 20), jnp.float32),
                 jnp.zeros((BATCH,), jnp.int32), jnp.zeros((BATCH,), jnp.int32))
    for name, lat_model in (
        ("latent", MLPUNetLatent(latent_dim=20, dtype=jnp.bfloat16)),
        ("dit", DiT(latent_dim=20, dtype=jnp.bfloat16)),
    ):
        dds_l = DeviceDataset([x_u8, y_i], BATCH, shuffle=True, seed=0,
                              u8_normalize=u8)
        step_l = make_resident_latent_multi_step(vae, lat_model, tx, schedule,
                                                 dds_l)
        state_l = create_train_state(lat_model, tx, example_l,
                                     jax.random.PRNGKey(23))
        hold = {"s": state_l}

        def call_l(idxs, step_l=step_l, hold=hold):
            hold["s"], losses = step_l(hold["s"], vae_params, idxs)
            return losses

        out[f"{name}_samples_per_sec_loop"] = round(run_loop(call_l, dds_l), 1)
    return out


def main():
    schedule = DiffusionSchedule.linear(1000)
    model = UNet28(dtype=jnp.bfloat16)
    tx = optax.adam(1e-3)

    rng = jax.random.PRNGKey(0)
    example = (jnp.zeros((BATCH, 28, 28, 1), jnp.float32), jnp.zeros((BATCH,), jnp.int32))
    state = create_train_state(model, tx, example, rng)

    mesh = make_mesh(("data",)) if len(jax.devices()) > 1 else None
    train_step = make_train_step(model, tx, schedule, mesh=mesh)

    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, 28, 28, 1)), jnp.float32
    )
    if mesh is not None:
        x0 = shard_batch(mesh, x0)

    # Warmup (compile) then timed steps. The donated-state chain makes the
    # final loss depend on every step; force() fetches it to host — the only
    # real completion fence on this backend (see obs/profiling.force).
    for _ in range(5):
        state, loss = train_step(state, x0)
    force(loss)
    train_dt, state = time_chained(train_step, state, x0, TRAIN_STEPS)
    n_chips = len(jax.devices())
    train_sps_per_chip = TRAIN_STEPS * BATCH / train_dt / n_chips

    # Host-streamed loop throughput (the explicit --data-placement host
    # opt-out; 'auto' promotes MNIST-scale sets to the resident path below):
    # uint8 host data, native gather batch assembly, threaded
    # device-prefetch with on-device normalize, log_every host syncs.
    from tinydiffusion_tpu.data.loader import BatchIterator, prefetch_to_device
    from tinydiffusion_tpu.obs.metrics import LossAccumulator
    from tinydiffusion_tpu.parallel.mesh import batch_sharding

    data_u8 = np.random.default_rng(1).integers(
        0, 256, size=(BATCH * (TRAIN_STEPS + 5), 28, 28, 1), dtype=np.uint8
    )
    it = BatchIterator(
        [data_u8], BATCH, shuffle=True, seed=0,
        u8_normalize=(2.0 / 255.0, -1.0), device_normalize=True,
    )
    batch_sh = batch_sharding(mesh) if mesh is not None else None
    state_loop = create_train_state(model, tx, example, jax.random.PRNGKey(7))
    # warmup epoch (same compiled step reused; warms the prefetch path too)
    for (xb,) in prefetch_to_device(
        it.epoch(0), sharding=batch_sh, transform=it.device_transform
    ):
        state_loop, loss = train_step(state_loop, xb)
    force(loss)
    acc = LossAccumulator()
    t0 = time.perf_counter()
    for i, (xb,) in enumerate(
        prefetch_to_device(it.epoch(1), sharding=batch_sh,
                           transform=it.device_transform)
    ):
        if i >= TRAIN_STEPS:
            break
        state_loop, loss = train_step(state_loop, xb)
        acc.add(loss)
        if i % 100 == 0:
            acc.last()
    acc.mean()  # epoch-end fetch = the fence
    loop_dt = time.perf_counter() - t0
    loop_sps = TRAIN_STEPS * BATCH / loop_dt / n_chips

    # Larger-batch training throughput (secondary; the MXU util headroom of
    # the reference recipe's batch 128).
    BIG = 512
    state_big = create_train_state(
        model, tx,
        (jnp.zeros((BIG, 28, 28, 1), jnp.float32), jnp.zeros((BIG,), jnp.int32)),
        jax.random.PRNGKey(3),
    )
    xbig = jnp.asarray(
        np.random.default_rng(1).standard_normal((BIG, 28, 28, 1)), jnp.float32
    )
    if mesh is not None:
        xbig = shard_batch(mesh, xbig)
    # Same methodology as the b128 headline number (TRAIN_STEPS timed
    # iterations, 5 warmups) — r2's 10-iteration timing overstated the
    # b512 gap (reported -7%; the step-level gap is -2%, BASELINE.md).
    for _ in range(5):
        state_big, loss_big = train_step(state_big, xbig)
    force(loss_big)
    big_dt, state_big = time_chained(train_step, state_big, xbig, TRAIN_STEPS)
    big_sps = TRAIN_STEPS * BIG / big_dt / n_chips

    # Fused Pallas q_sample path (opt-in flag; VERDICT weak #4 wiring).
    fused_stats = {}
    if mesh is None or mesh.devices.size == 1:
        step_fused = make_train_step(
            model, tx, schedule, mesh=mesh, fused_qsample=True
        )
        state_f = create_train_state(model, tx, example, jax.random.PRNGKey(5))
        for _ in range(5):
            state_f, loss_f = step_fused(state_f, x0)
        force(loss_f)
        fdt, state_f = time_chained(step_fused, state_f, x0, TRAIN_STEPS)
        fused_stats = {
            "train_step_ms_fused": round(fdt / TRAIN_STEPS * 1e3, 3),
            "train_samples_per_sec_fused": round(TRAIN_STEPS * BATCH / fdt / n_chips, 1),
        }

    # HBM-resident dataset path: the whole uint8 dataset pinned on device,
    # batches gathered + normalized INSIDE the scanned epoch program — the
    # loop-vs-step gap above is per-batch H2D + dispatch overhead, and this
    # is the shipped fix (data/device.DeviceDataset + make_resident_multi_step).
    from tinydiffusion_tpu.data.device import DeviceDataset
    from tinydiffusion_tpu.train.trainer import make_resident_multi_step

    dds = DeviceDataset([data_u8], BATCH, shuffle=True, seed=0,
                        u8_normalize=(2.0 / 255.0, -1.0))
    resident = make_resident_multi_step(model, tx, schedule, dds)
    state_r = create_train_state(model, tx, example, jax.random.PRNGKey(9))
    state_r, rl = resident(state_r, jnp.asarray(dds.epoch_index_batches(0)))
    force(rl)
    n_res_steps = 0
    t0 = time.perf_counter()
    for ep in range(1, 4):
        idxs = jnp.asarray(dds.epoch_index_batches(ep))
        state_r, rl = resident(state_r, idxs)
        n_res_steps += idxs.shape[0]
    force(rl)
    resident_dt = time.perf_counter() - t0
    resident_sps = n_res_steps * BATCH / resident_dt / n_chips

    # Multi-step dispatch on a small-model step (the LatentUNet scale, where
    # per-dispatch tunnel overhead dominates compute): K=8 scanned batches
    # per dispatch vs one dispatch per batch (train.trainer.make_multi_step).
    from tinydiffusion_tpu.models.mlp_unet import MLPUNetLatent
    from tinydiffusion_tpu.train.trainer import make_multi_step

    K, LB, LD = 8, 128, 20
    lat_model = MLPUNetLatent(latent_dim=LD, dtype=jnp.bfloat16)
    ly = jnp.zeros((LB,), jnp.int32)
    lat_example = (jnp.zeros((LB, LD), jnp.float32), ly, ly)
    lrng = np.random.default_rng(2)
    lx = jnp.asarray(lrng.standard_normal((K, LB, LD)), jnp.float32)
    lys = jnp.asarray(lrng.integers(0, 10, (K, LB)), jnp.int32)

    lat_single = make_train_step(lat_model, tx, schedule, conditional=True)
    lat_multi = make_multi_step(lat_model, tx, schedule, k=K, conditional=True)
    ls = create_train_state(lat_model, tx, lat_example, jax.random.PRNGKey(11))
    lm = create_train_state(lat_model, tx, lat_example, jax.random.PRNGKey(11))
    for i in range(K):
        ls, l1 = lat_single(ls, lx[i], lys[i])
    lm, l2 = lat_multi(lm, lx, lys)
    force(l1), force(l2)
    t0 = time.perf_counter()
    for _ in range(20):
        for i in range(K):
            ls, l1 = lat_single(ls, lx[i], lys[i])
    force(l1)
    dt_lat_single = (time.perf_counter() - t0) / (20 * K)
    t0 = time.perf_counter()
    for _ in range(20):
        lm, l2 = lat_multi(lm, lx, lys)
    force(l2)
    dt_lat_multi = (time.perf_counter() - t0) / (20 * K)

    # Full 1000-step on-device sampling chain (reference recipe: 16 images)
    # in fp32 — THE SHIPPED DEFAULT (every experiment's sample_dtype).
    def time_sampler(dtype, n):
        sampler = make_sampler(model, schedule, (n, 28, 28, 1), dtype=dtype)
        out = sampler(state.params, state.batch_stats, jax.random.PRNGKey(1))
        force(out)  # compile + real completion
        t0 = time.perf_counter()
        out = sampler(state.params, state.batch_stats, jax.random.PRNGKey(2))
        force(out)
        return time.perf_counter() - t0

    sample_dt = time_sampler(jnp.float32, N_SAMPLE_IMAGES)
    images_per_sec = N_SAMPLE_IMAGES / sample_dt
    images_per_sec_b128 = 128 / time_sampler(jnp.float32, 128)
    # bf16 chain: labeled extra only (NOT the shipped configuration).
    images_per_sec_bf16 = N_SAMPLE_IMAGES / time_sampler(jnp.bfloat16, N_SAMPLE_IMAGES)

    # DDIM-50 serving path (generate.py --sampler ddim): same checkpoint,
    # 50 model forwards instead of 1000, fp32, deterministic (eta=0).
    ddim_sampler = make_sampler(
        model, schedule, (N_SAMPLE_IMAGES, 28, 28, 1), dtype=jnp.float32,
        method="ddim", sample_steps=50,
    )
    out = ddim_sampler(state.params, state.batch_stats, jax.random.PRNGKey(1))
    force(out)
    t0 = time.perf_counter()
    out = ddim_sampler(state.params, state.batch_stats, jax.random.PRNGKey(2))
    force(out)
    images_per_sec_ddim50 = N_SAMPLE_IMAGES / (time.perf_counter() - t0)

    # DPM-Solver++(2M)-20 (generate.py --sampler dpmpp): 20 forwards at
    # better-than-ancestral FID (BASELINE.md sampler table).
    dpmpp_sampler = make_sampler(
        model, schedule, (N_SAMPLE_IMAGES, 28, 28, 1), dtype=jnp.float32,
        method="dpmpp", sample_steps=20,
    )
    out = dpmpp_sampler(state.params, state.batch_stats, jax.random.PRNGKey(1))
    force(out)
    t0 = time.perf_counter()
    out = dpmpp_sampler(state.params, state.batch_stats, jax.random.PRNGKey(2))
    force(out)
    images_per_sec_dpmpp20 = N_SAMPLE_IMAGES / (time.perf_counter() - t0)

    # --- self-certification extras (round-4 VERDICT weak #6: every headline
    # BASELINE.md number needs a machine-captured twin in BENCH_r*.json) ---

    # UNet28 train MFU from the compiled executable's own FLOP count
    # (tools/mfu.py method: XLA cost analysis / fenced step time / v5e
    # bf16 peak 197 TFLOP/s).
    extras = {}
    try:
        cost = train_step.lower(state, x0).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        step_flops = float(cost["flops"])
        extras["train_flops_per_step"] = step_flops
        extras["train_mfu_bf16_peak"] = round(
            step_flops / (train_dt / TRAIN_STEPS) / 197e12, 4
        )
        # The SHIPPED loop's MFU: the resident multi-step amortizes the
        # ~1 ms/dispatch tunnel overhead over a whole epoch, so the
        # loop-level MFU is the honest utilization of the default
        # (data_placement='auto') training path. Same per-step FLOPs (the
        # in-program gather+normalize adds no matmul work).
        extras["train_mfu_resident_loop"] = round(
            step_flops * n_res_steps / resident_dt / 197e12, 4
        )
    except Exception as e:  # noqa: BLE001
        extras["train_mfu_error"] = repr(e)

    # LAION conv-VAE 256^2 train step (BASELINE.md's 33.4 ms r3 claim).
    try:
        import importlib.util as _ilu
        import os as _os

        spec = _ilu.spec_from_file_location(
            "mfu_tool", _os.path.join(_os.path.dirname(
                _os.path.abspath(__file__)), "tools", "mfu.py"))
        mfu_tool = _ilu.module_from_spec(spec)
        spec.loader.exec_module(mfu_tool)
        v = mfu_tool.mfu_vae256()
        extras["vae256_step_ms"] = v["step_ms"]
        extras["vae256_mfu_bf16_peak"] = v["mfu_vs_bf16_peak"]
    except Exception as e:  # noqa: BLE001
        extras["vae256_error"] = repr(e)

    # Resident loop-level rates for the rest of the zoo (BASELINE.md's
    # conditional/latent/DiT loop claims), each measured exactly as the
    # experiments run them: K-batch chunks through the HBM-resident
    # scanned program.
    try:
        extras.update(zoo_loop_rates(schedule, tx, n_chips))
    except Exception as e:  # noqa: BLE001
        extras["zoo_loops_error"] = repr(e)

    checks = kernel_selfchecks()

    vs_baseline = (
        train_sps_per_chip / REFERENCE_CPU_TRAIN_SAMPLES_PER_SEC
        if REFERENCE_CPU_TRAIN_SAMPLES_PER_SEC
        else None
    )
    print(
        json.dumps(
            {
                "metric": "MNIST DDPM train samples/sec/chip (batch 128)",
                "value": round(train_sps_per_chip, 1),
                "unit": "samples/sec/chip",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "train_samples_per_sec_loop": round(resident_sps, 1),
                "train_samples_per_sec_loop_host": round(loop_sps, 1),
                "train_samples_per_sec_b512": round(big_sps, 1),
                **fused_stats,
                "sample_1000step_images_per_sec_fp32": round(images_per_sec, 3),
                "sample_1000step_images_per_sec_b128_fp32": round(images_per_sec_b128, 3),
                "sample_1000step_images_per_sec_bf16": round(images_per_sec_bf16, 3),
                "sample_ddim50_images_per_sec_fp32": round(images_per_sec_ddim50, 3),
                "sample_dpmpp20_images_per_sec_fp32": round(images_per_sec_dpmpp20, 3),
                "sample_chain_seconds_fp32": round(sample_dt, 3),
                "train_step_ms": round(train_dt / TRAIN_STEPS * 1e3, 3),
                "latent_step_ms_single_dispatch": round(dt_lat_single * 1e3, 3),
                "latent_step_ms_k8_dispatch": round(dt_lat_multi * 1e3, 3),
                "multistep_speedup_k8": round(dt_lat_single / dt_lat_multi, 2),
                **extras,
                **checks,
                "n_chips": n_chips,
                "device": str(jax.devices()[0]),
                "baseline_cpu_train_sps": REFERENCE_CPU_TRAIN_SAMPLES_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
