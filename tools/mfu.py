"""MFU measurement: XLA-counted FLOPs / measured step time / chip peak.

Uses the compiled executable's own cost analysis (exact HLO FLOP count,
not a hand estimate) and the honest host-fetch timing fence
(obs/profiling.force — block_until_ready does not fence on this backend).

Run on the real TPU:  python tools/mfu.py [--model unet28|vae256]

Peak reference: TPU v5e (v5 lite) = 197 TFLOP/s bf16, 394 TOP/s int8.
The train steps here run bf16 compute / fp32 params, so bf16 peak is the
denominator; fp32-peak MFU would be ~2x the printed number.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinydiffusion_tpu.obs.profiling import force

V5E_BF16_PEAK_FLOPS = 197e12


def _time_step(step, state, args, iters=30, warmup=5):
    for _ in range(warmup):
        state, loss = step(state, *args)
    force(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, *args)
    force(loss)
    return (time.perf_counter() - t0) / iters


def _flops_of(jitted, *args) -> float:
    cost = jitted.lower(*args).compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost["flops"])


def _hbm_of(jitted, *args) -> dict:
    """Compiled-program HBM footprint from XLA's memory analysis (bytes)."""
    mem = jitted.lower(*args).compile().memory_analysis()
    if mem is None:
        return {}
    out = {}
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(mem, k, None)
        if v is not None:
            out[k.replace("_size_in_bytes", "_mb")] = round(v / 2**20, 1)
    return out


def mfu_unet28(batch: int = 128) -> dict:
    """The bench.py headline step: UNet28 DDPM train, batch 128."""
    from tinydiffusion_tpu.core.schedule import DiffusionSchedule
    from tinydiffusion_tpu.models.unet28 import UNet28
    from tinydiffusion_tpu.train.trainer import create_train_state, make_train_step

    model = UNet28(dtype=jnp.bfloat16)
    tx = optax.adam(1e-3)
    schedule = DiffusionSchedule.linear(1000)
    example = (jnp.zeros((batch, 28, 28, 1), jnp.float32),
               jnp.zeros((batch,), jnp.int32))
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, schedule)
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 28, 28, 1)), jnp.float32
    )
    flops = _flops_of(step, state, x0)
    hbm = _hbm_of(step, state, x0)
    dt = _time_step(step, state, (x0,))
    return {
        "model": "unet28_train_b128",
        "flops_per_step": flops,
        "step_ms": round(dt * 1e3, 3),
        "tflops_per_sec": round(flops / dt / 1e12, 2),
        "mfu_vs_bf16_peak": round(flops / dt / V5E_BF16_PEAK_FLOPS, 4),
        **hbm,
    }


def mfu_vae256(batch: int = 4, compute_dtype: str = "float32") -> dict:
    """The LAION conv-VAE at the reference's full 256x256 recipe, in the
    SHIPPED compute dtype (fp32 — bf16 is blocked on a TPU-toolchain
    miscompilation, see VAELaionConfig.compute_dtype)."""
    from tinydiffusion_tpu.experiments.vae_laion import (
        ConvVAETrainState,
        make_conv_vae_train_step,
    )
    from tinydiffusion_tpu.models.vae_conv import ConvVAE, PerceptualNet

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    model = ConvVAE(latent_dim=128, image_size=256, dtype=dtype)
    perceptual = PerceptualNet(dtype=dtype)
    perc_params = perceptual.init(
        jax.random.PRNGKey(123), jnp.zeros((1, 256, 256, 3))
    )["params"]
    tx = optax.adam(1e-4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 256, 256, 3)),
        jax.random.PRNGKey(0), train=False,
    )
    state = ConvVAETrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(1),
    )
    step = make_conv_vae_train_step(model, perceptual, perc_params, tx, beta=1.0)
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, 256, 256, 3)), jnp.float32
    )
    # Donated state: re-create for timing after the cost analysis pass.
    flops = _flops_of(step, state, x)
    hbm = _hbm_of(step, state, x)
    dt_state = ConvVAETrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(2),
    )

    def stepper(s, xx):
        s2, loss, _ = step(s, xx)
        return s2, loss

    dt = _time_step(stepper, dt_state, (x,), iters=10, warmup=3)
    return {
        "model": "conv_vae_256_train_b4",
        "flops_per_step": flops,
        "step_ms": round(dt * 1e3, 3),
        "tflops_per_sec": round(flops / dt / 1e12, 2),
        "mfu_vs_bf16_peak": round(flops / dt / V5E_BF16_PEAK_FLOPS, 4),
        **hbm,
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default="unet28", choices=["unet28", "vae256"])
    args = parser.parse_args()
    fn = {"unet28": mfu_unet28, "vae256": mfu_vae256}[args.model]
    out = fn()
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
