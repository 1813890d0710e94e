"""Benchmark harness — run on the real TPU chip by the driver.

Prints the scoreboard JSON line INCREMENTALLY: the headline (train
samples/sec/chip) is emitted as soon as it exists, and the line is
re-emitted — extended — after every completed stage. The driver parses the
LAST parseable JSON line, so a timeout at any point records everything
measured up to it instead of nothing (round-4 regression: BENCH_r04.json
was rc=124/parsed=null because the old all-or-nothing script printed only
at the very end of a 22-minute cold run).

Primary metric: MNIST DDPM train samples/sec/chip at the reference recipe
(UNet28, batch 128, Adam, T=1000) — per BASELINE.json.

Robustness rules (round-4 VERDICT weak #1/#2/#7):
- **Budget-gated stages.** Each stage has a conservative cold-compile cost
  estimate and only runs if it fits the remaining wall budget
  (default 480 s, env BENCH_BUDGET_S; ``--full`` removes the budget).
  Stages are priority-ordered: headline -> sampler -> shipped loop ->
  kernel self-checks -> fast samplers -> ... -> conv-VAE 256^2 (the most
  expensive single compile, last).
- **Signal handlers.** SIGTERM/SIGINT/SIGALRM emit the current line and
  exit, so `timeout N python bench.py` still captures a scoreboard.
- **Fenced warmups.** Every warmup call is force()-fenced before its timed
  region starts — the r4 conditional-loop number was 7x low because the
  timed epochs absorbed the warmup's compile tail on this async backend.
- **Noise discipline.** Dispatch-overhead-bound metrics (latent step
  single/multi, loop rates) report the min over >=3 repeats
  (``timing_repeats`` key); single-shot numbers on those paths swung 4.99
  -> 8.39 ms between captures with no code change.
- sampling numbers are fp32 — the configuration every experiment ships
  (``sample_dtype="float32"``; a 1000-step bf16 chain visibly degrades
  samples). bf16 rides along explicitly labeled.
- all timings use the host-fetch fence (obs/profiling.force):
  ``jax.block_until_ready`` does not fence on this backend.

vs_baseline compares against the reference's PyTorch-CPU yardstick measured
with tools/measure_reference_baseline.py on this machine (the reference
publishes no numbers — BASELINE.md).
"""

import json
import os
import signal
import sys
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
REPEATS = 3  # min-of-N for every timed region

T0 = time.monotonic()
RESULTS: dict = {
    "metric": "MNIST DDPM train samples/sec/chip (batch 128)",
    "value": None,
    "unit": "samples/sec/chip",
    "vs_baseline": None,
    "timing_repeats": REPEATS,
    "baseline_cpu_train_sps": REFERENCE_CPU_TRAIN_SAMPLES_PER_SEC,
}
STAGES_DONE: list = []
STAGES_SKIPPED: list = []


def emit():
    RESULTS["elapsed_s"] = round(time.monotonic() - T0, 1)
    RESULTS["stages_completed"] = list(STAGES_DONE)
    RESULTS["stages_skipped_for_budget"] = list(STAGES_SKIPPED)
    print(json.dumps(RESULTS), flush=True)


def _on_signal(signum, frame):
    RESULTS["interrupted_by_signal"] = signal.Signals(signum).name
    emit()
    os._exit(0)


def min_of(fn, reps=REPEATS):
    """Min of ``reps`` timed calls of fn() (fn returns elapsed seconds)."""
    return min(fn() for _ in range(reps))


def run_stage(name, budget_left_needed, fn, budget):
    """Run a stage if its conservative cost estimate fits the remaining
    budget; never let one stage's failure kill the scoreboard."""
    remaining = budget - (time.monotonic() - T0)
    if remaining < budget_left_needed:
        STAGES_SKIPPED.append(f"{name} (est {budget_left_needed:.0f}s > "
                              f"left {remaining:.0f}s)")
        emit()
        return
    print(f"[bench] stage {name} start t={time.monotonic() - T0:.0f}s",
          file=sys.stderr, flush=True)
    try:
        fn()
        STAGES_DONE.append(name)
    except Exception as e:  # noqa: BLE001
        RESULTS[f"{name}_error"] = repr(e)[:300]
    print(f"[bench] stage {name} end t={time.monotonic() - T0:.0f}s",
          file=sys.stderr, flush=True)
    emit()


def kernel_selfchecks() -> dict:
    """Native Pallas kernel verification, executed on whatever backend the
    bench runs on (the driver runs it on the real TPU)."""
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
        # Warmup chunk (compile) — force()-FENCED so the timed epochs never
        # absorb the compile/warmup tail (the r4 bug: the conditional loop
        # read 1,590/s vs its true ~11k because this fence was missing).
        force(step_call(jnp.asarray(dds.epoch_index_batches(0))))

        def one_pass():
            n, t0 = 0, time.perf_counter()
            for ep in (1, 2):
                idxs = jnp.asarray(dds.epoch_index_batches(ep))
                loss = step_call(idxs)
                n += idxs.shape[0]
            force(loss)
            return (time.perf_counter() - t0) / (n * BATCH)

        return 1.0 / min_of(one_pass) / n_chips

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
    budget = float(os.environ.get("BENCH_BUDGET_S", "480"))
    if "--full" in sys.argv:
        budget = float("inf")
    RESULTS["budget_s"] = None if budget == float("inf") else budget
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _on_signal)
    if budget != float("inf"):
        # Belt-and-suspenders: even if a stage's cost estimate was wrong,
        # emit whatever exists shortly after the budget expires.
        signal.signal(signal.SIGALRM, _on_signal)
        signal.alarm(int(budget + 60))

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
    n_chips = len(jax.devices())
    RESULTS["n_chips"] = n_chips
    RESULTS["device"] = str(jax.devices()[0])

    state_box = {"s": state}

    def time_chained(step, x, iters):
        """Time ``iters`` donated-state steps; force() fetch is the fence."""
        t0 = time.perf_counter()
        for _ in range(iters):
            state_box["s"], loss = step(state_box["s"], x)
        force(loss)
        return time.perf_counter() - t0

    # ---- stage: headline train step (the compile the whole repo is about) --
    def stage_train():
        for _ in range(5):
            state_box["s"], loss = train_step(state_box["s"], x0)
        force(loss)
        train_dt = min_of(lambda: time_chained(train_step, x0, TRAIN_STEPS))
        sps = TRAIN_STEPS * BATCH / train_dt / n_chips
        RESULTS["value"] = round(sps, 1)
        RESULTS["vs_baseline"] = round(sps / REFERENCE_CPU_TRAIN_SAMPLES_PER_SEC, 2)
        RESULTS["train_step_ms"] = round(train_dt / TRAIN_STEPS * 1e3, 3)
        # The headline exists NOW — emit before the cost-analysis compile
        # below, which is a SECOND full remote AOT round trip on this
        # backend (lower().compile() does not reuse the traced executable)
        # and can take 40-200+ s when the service degrades. Without this,
        # a hang there loses the headline the stage already measured.
        emit()
        budget_s = RESULTS.get("budget_s")
        if budget_s is not None and (
            budget_s - (time.monotonic() - T0) < 180.0
        ):
            RESULTS["train_mfu_skipped"] = "cost-analysis compile needs ~180s"
            return
        # MFU from the compiled executable's own FLOP count (tools/mfu.py
        # method: XLA cost analysis / fenced step time / v5e bf16 peak
        # 197 TFLOP/s).
        try:
            cost = train_step.lower(state_box["s"], x0).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            step_flops = float(cost["flops"])
            RESULTS["train_flops_per_step"] = step_flops
            RESULTS["train_mfu_bf16_peak"] = round(
                step_flops / (train_dt / TRAIN_STEPS) / 197e12, 4
            )
        except Exception as e:  # noqa: BLE001
            RESULTS["train_mfu_error"] = repr(e)[:200]

    # ---- stage: 1000-step fp32 sampling chain (the serving default) -------
    def time_sampler(dtype, n, method="ddpm", steps=None):
        kw = {} if steps is None else {"method": method, "sample_steps": steps}
        sampler = make_sampler(model, schedule, (n, 28, 28, 1), dtype=dtype, **kw)
        s = state_box["s"]
        force(sampler(s.params, s.batch_stats, jax.random.PRNGKey(1)))

        def one():
            t0 = time.perf_counter()
            force(sampler(s.params, s.batch_stats, jax.random.PRNGKey(2)))
            return time.perf_counter() - t0

        return min_of(one)

    def stage_sampler():
        dt = time_sampler(jnp.float32, N_SAMPLE_IMAGES)
        RESULTS["sample_1000step_images_per_sec_fp32"] = round(N_SAMPLE_IMAGES / dt, 3)
        RESULTS["sample_chain_seconds_fp32"] = round(dt, 3)

    # ---- stage: the SHIPPED training loop (HBM-resident epoch program) -----
    def stage_resident():
        from tinydiffusion_tpu.data.device import DeviceDataset
        from tinydiffusion_tpu.train.trainer import make_resident_multi_step

        data_u8 = np.random.default_rng(1).integers(
            0, 256, size=(BATCH * (TRAIN_STEPS + 5), 28, 28, 1), dtype=np.uint8
        )
        dds = DeviceDataset([data_u8], BATCH, shuffle=True, seed=0,
                            u8_normalize=(2.0 / 255.0, -1.0))
        resident = make_resident_multi_step(model, tx, schedule, dds)
        state_r = create_train_state(model, tx, example, jax.random.PRNGKey(9))
        state_r, rl = resident(state_r, jnp.asarray(dds.epoch_index_batches(0)))
        force(rl)
        box = {"s": state_r}

        def one_pass():
            n, t0 = 0, time.perf_counter()
            for ep in range(1, 4):
                idxs = jnp.asarray(dds.epoch_index_batches(ep))
                box["s"], rl = resident(box["s"], idxs)
                n += idxs.shape[0]
            force(rl)
            return (time.perf_counter() - t0) / n

        per_step = min_of(one_pass)
        RESULTS["train_samples_per_sec_loop"] = round(BATCH / per_step / n_chips, 1)
        # The SHIPPED loop's MFU: the resident multi-step amortizes the
        # per-dispatch tunnel overhead (measured ~1.15 ms fenced-minus-device
        # delta on this step; ~5-6 ms on a bare small dispatch — BASELINE.md)
        # over a whole epoch, so loop-level MFU is the honest utilization of
        # the default (data_placement='auto') training path.
        if "train_flops_per_step" in RESULTS:
            RESULTS["train_mfu_resident_loop"] = round(
                RESULTS["train_flops_per_step"] / per_step / 197e12, 4
            )

    # ---- stage: Pallas kernel self-checks ----------------------------------
    def stage_kernels():
        RESULTS.update(kernel_selfchecks())

    # ---- stage: accelerated serving samplers -------------------------------
    def stage_fast_samplers():
        dt = time_sampler(jnp.float32, N_SAMPLE_IMAGES, "ddim", 50)
        RESULTS["sample_ddim50_images_per_sec_fp32"] = round(N_SAMPLE_IMAGES / dt, 3)
        dt = time_sampler(jnp.float32, N_SAMPLE_IMAGES, "dpmpp", 20)
        RESULTS["sample_dpmpp20_images_per_sec_fp32"] = round(N_SAMPLE_IMAGES / dt, 3)

    # ---- stage: host-streamed loop (the --data-placement host opt-out) -----
    # Reuses the already-compiled train_step: no new compile.
    def stage_host_loop():
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
        box = {"s": create_train_state(model, tx, example, jax.random.PRNGKey(7))}
        # warmup epoch (same compiled step reused; warms the prefetch path)
        for (xb,) in prefetch_to_device(
            it.epoch(0), sharding=batch_sh, transform=it.device_transform
        ):
            box["s"], loss = train_step(box["s"], xb)
        force(loss)

        def one_pass():
            acc = LossAccumulator()
            t0 = time.perf_counter()
            n = 0
            for i, (xb,) in enumerate(
                prefetch_to_device(it.epoch(1), sharding=batch_sh,
                                   transform=it.device_transform)
            ):
                if i >= TRAIN_STEPS:
                    break
                box["s"], loss = train_step(box["s"], xb)
                acc.add(loss)
                n += 1
                if i % 100 == 0:
                    acc.last()
            acc.mean()  # epoch-end fetch = the fence
            return (time.perf_counter() - t0) / n

        RESULTS["train_samples_per_sec_loop_host"] = round(
            BATCH / min_of(one_pass) / n_chips, 1
        )

    # ---- stage: multi-step dispatch on the latent-scale step ---------------
    def stage_multistep():
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
        sbox = {"s": ls, "m": lm}

        def one_single():
            t0 = time.perf_counter()
            for _ in range(20):
                for i in range(K):
                    sbox["s"], l1 = lat_single(sbox["s"], lx[i], lys[i])
            force(l1)
            return (time.perf_counter() - t0) / (20 * K)

        def one_multi():
            t0 = time.perf_counter()
            for _ in range(20):
                sbox["m"], l2 = lat_multi(sbox["m"], lx, lys)
            force(l2)
            return (time.perf_counter() - t0) / (20 * K)

        dt_s, dt_m = min_of(one_single), min_of(one_multi)
        RESULTS["latent_step_ms_single_dispatch"] = round(dt_s * 1e3, 3)
        RESULTS["latent_step_ms_k8_dispatch"] = round(dt_m * 1e3, 3)
        RESULTS["multistep_speedup_k8"] = round(dt_s / dt_m, 2)

    # ---- stage: secondary train-step variants (one new compile each) -------
    def stage_b512():
        BIG = 512
        sbig = create_train_state(
            model, tx,
            (jnp.zeros((BIG, 28, 28, 1), jnp.float32), jnp.zeros((BIG,), jnp.int32)),
            jax.random.PRNGKey(3),
        )
        xbig = jnp.asarray(
            np.random.default_rng(1).standard_normal((BIG, 28, 28, 1)), jnp.float32
        )
        if mesh is not None:
            xbig = shard_batch(mesh, xbig)
        box = {"s": sbig}
        for _ in range(5):
            box["s"], lb = train_step(box["s"], xbig)
        force(lb)

        def one():
            t0 = time.perf_counter()
            for _ in range(TRAIN_STEPS):
                box["s"], lb = train_step(box["s"], xbig)
            force(lb)
            return time.perf_counter() - t0

        RESULTS["train_samples_per_sec_b512"] = round(
            TRAIN_STEPS * BIG / min_of(one) / n_chips, 1
        )

    def stage_fused_qsample():
        if mesh is not None and mesh.devices.size > 1:
            return
        step_fused = make_train_step(model, tx, schedule, mesh=mesh,
                                     fused_qsample=True)
        box = {"s": create_train_state(model, tx, example, jax.random.PRNGKey(5))}
        for _ in range(5):
            box["s"], lf = step_fused(box["s"], x0)
        force(lf)

        def one():
            t0 = time.perf_counter()
            for _ in range(TRAIN_STEPS):
                box["s"], lf = step_fused(box["s"], x0)
            force(lf)
            return time.perf_counter() - t0

        fdt = min_of(one)
        RESULTS["train_step_ms_fused"] = round(fdt / TRAIN_STEPS * 1e3, 3)
        RESULTS["train_samples_per_sec_fused"] = round(
            TRAIN_STEPS * BATCH / fdt / n_chips, 1
        )

    def stage_more_samplers():
        RESULTS["sample_1000step_images_per_sec_b128_fp32"] = round(
            128 / time_sampler(jnp.float32, 128), 3
        )
        RESULTS["sample_1000step_images_per_sec_bf16"] = round(
            N_SAMPLE_IMAGES / time_sampler(jnp.bfloat16, N_SAMPLE_IMAGES), 3
        )

    # ---- stage: zoo resident-loop rates (3 new compiles) -------------------
    def stage_zoo():
        RESULTS.update(zoo_loop_rates(schedule, tx, n_chips))

    # ---- stage: LAION conv-VAE 256^2 step (the most expensive compile) -----
    def stage_vae256():
        import importlib.util as _ilu

        spec = _ilu.spec_from_file_location(
            "mfu_tool", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tools", "mfu.py"))
        mfu_tool = _ilu.module_from_spec(spec)
        spec.loader.exec_module(mfu_tool)
        v = mfu_tool.mfu_vae256()
        RESULTS["vae256_step_ms"] = v["step_ms"]
        RESULTS["vae256_mfu_bf16_peak"] = v["mfu_vs_bf16_peak"]

    # Priority order. Cost estimates are conservative COLD-compile wall
    # costs measured on this backend's remote AOT service (first run of a
    # round pays them; the persistent compile cache makes reruns cheap).
    run_stage("train", 240, stage_train, budget)
    run_stage("sampler_fp32", 120, stage_sampler, budget)
    run_stage("resident_loop", 120, stage_resident, budget)
    run_stage("kernels", 100, stage_kernels, budget)
    run_stage("fast_samplers", 120, stage_fast_samplers, budget)
    run_stage("host_loop", 120, stage_host_loop, budget)
    run_stage("multistep", 120, stage_multistep, budget)
    run_stage("b512", 90, stage_b512, budget)
    run_stage("fused_qsample", 90, stage_fused_qsample, budget)
    run_stage("more_samplers", 150, stage_more_samplers, budget)
    run_stage("zoo_loops", 240, stage_zoo, budget)
    run_stage("vae256", 300, stage_vae256, budget)


if __name__ == "__main__":
    main()
