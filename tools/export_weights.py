"""Export an Orbax checkpoint to the portable committed weights format.

Reads a full Orbax state dir (params + opt_state + rng + step, the exact-
resume format) and writes `<checkpoint>.npz` holding the serving subset —
params / batch_stats / ema_params / step, float params as bfloat16 — via
``io.checkpoint.save_weights``. The npz plus the existing JSON sidecar is
everything `generate.py` / `tools/fid_eval.py` / the experiment loaders need
(``restore_checkpoint`` falls back to it transparently), so committing the
npz makes the trained artifact survive across sessions and clones — the
reference's distributable-checkpoint flow (latent_diffusion.py:422-429)
without the 2x-fp32 optimizer dead weight.

Usage:
    python tools/export_weights.py --checkpoint checkpoints/diffusion_final
    python tools/export_weights.py --all          # every sidecar with a dir
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_one(path: str) -> str:
    import orbax.checkpoint as ocp

    from tinydiffusion_tpu.io.checkpoint import save_weights

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no Orbax checkpoint dir at {path}")
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path)  # as-saved pytree of numpy-backed arrays
    out = save_weights(path, state)
    n_mb = os.path.getsize(out) / 2**20
    print(f"{path} -> {out} ({n_mb:.1f} MB)")
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", default=None,
                        help="Orbax checkpoint dir (sidecar .json beside it)")
    parser.add_argument("--all", action="store_true",
                        help="export every checkpoints/*.json whose dir exists")
    args = parser.parse_args(argv)

    # Exports are pure host IO; keep the TPU free for whatever is training.
    import jax

    jax.config.update("jax_platforms", "cpu")

    if args.all:
        done = 0
        for sidecar in sorted(glob.glob("checkpoints/*.json")):
            path = sidecar[: -len(".json")]
            if os.path.isdir(path):
                export_one(path)
                done += 1
            else:
                print(f"skip {path} (no Orbax dir)")
        if not done:
            sys.exit("nothing exported: no checkpoint dirs found")
    elif args.checkpoint:
        export_one(args.checkpoint)
    else:
        parser.error("pass --checkpoint PATH or --all")


if __name__ == "__main__":
    main()
