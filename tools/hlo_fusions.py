"""Fusion-structure evidence for the UNet28 train step (round-4 VERDICT #1).

Compiles the train step (AOT — no chip execution) and reports, from the
optimized HLO, how the BatchNorm statistics are scheduled: which fusions
contain BOTH a convolution and reduce ops (i.e. XLA already computes the
fp32 sum / sum-of-squares epilogues in the same pass that writes the conv
output), plus op-category counts (select-and-scatter, copies, convs).

This is the measured answer to "would a hand-fused conv+BN-stats Pallas
kernel delete an HBM re-read pass?" — see BASELINE.md's MFU section.

Usage:  python tools/hlo_fusions.py [--batch 128]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=128)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tinydiffusion_tpu.core.schedule import DiffusionSchedule
    from tinydiffusion_tpu.models.unet28 import UNet28
    from tinydiffusion_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    model = UNet28(dtype=jnp.bfloat16)
    tx = optax.adam(1e-3)
    schedule = DiffusionSchedule.linear(1000)
    example = (jnp.zeros((args.batch, 28, 28, 1), jnp.float32),
               jnp.zeros((args.batch,), jnp.int32))
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, schedule)
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((args.batch, 28, 28, 1)),
        jnp.float32,
    )
    txt = step.lower(state, x0).compile().as_text()

    # Split the optimized HLO into computations.
    comps = re.split(r"\n(?=%?\w[\w.\-]* \([^)]*\) -> )", txt)
    fusion_bodies = [c for c in comps if c.split(" ", 1)[0].lstrip("%")
                     .startswith(("fused_", "region_"))]

    def has(body, *pats):
        return all(re.search(p, body) for p in pats)

    conv_stat = [c for c in fusion_bodies
                 if has(c, r"convolution", r"\breduce\(")]
    conv_only = [c for c in fusion_bodies
                 if has(c, r"convolution") and not has(c, r"\breduce\(")]
    reduce_only = [c for c in fusion_bodies
                   if has(c, r"\breduce\(") and not has(c, r"convolution")]

    print(f"optimized HLO: {len(txt.splitlines())} lines, "
          f"{len(fusion_bodies)} fusion/region computations")
    print(f"fusions with conv AND reduce epilogues : {len(conv_stat)}")
    print(f"fusions with conv only                 : {len(conv_only)}")
    print(f"fusions with reduce only               : {len(reduce_only)}")
    for name, pat in [
        ("select-and-scatter ops", r"select-and-scatter"),
        ("standalone copy ops", r"\n\s*%?copy[.\d]* = "),
        ("convolution ops", r"= \S+ convolution\("),
        ("custom-call ops", r"custom-call\("),
        ("transpose ops", r"= \S+ transpose\("),
    ]:
        print(f"{name:38s}: {len(re.findall(pat, txt))}")

    # Show one conv+stats fusion body (trimmed) as the citable evidence.
    if conv_stat:
        body = conv_stat[0]
        lines = body.splitlines()
        keep = [ln for ln in lines
                if re.search(r"convolution|reduce\(|multiply|convert|ROOT|->",
                             ln)]
        print("\n--- representative conv+reduce fusion (trimmed) ---")
        print("\n".join(keep[:25]))


if __name__ == "__main__":
    main()
