"""Convert a reference (PyTorch) checkpoint into a tinydiffusion_tpu one.

Migration path for users of david-wb/tiny-diffusion: take a ``.pth`` file
saved by any reference script — a bare ``state_dict`` (conditional_diffusion.py:300)
or a rich dict with ``model_state_dict`` (vae.py:168-178) — convert weights
through compat.torch_import, wrap in a fresh resumable train state, and save
as an Orbax checkpoint loadable by generate.py / the experiments.

  python tools/import_torch_checkpoint.py --model unet28 \
      --pth best_model.pth --out checkpoints/imported

Models: unet28 | conditional_unet28 | vae_mnist | mlp_unet | dit
"""

import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True,
                        choices=["unet28", "conditional_unet28", "vae_mnist",
                                 "mlp_unet", "dit"])
    parser.add_argument("--pth", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    import torch

    import jax
    import jax.numpy as jnp
    import optax

    from tinydiffusion_tpu.compat import torch_import as ti
    from tinydiffusion_tpu.io.checkpoint import save_checkpoint
    from tinydiffusion_tpu.train.trainer import DiffusionTrainState

    raw = torch.load(args.pth, map_location="cpu")
    sd = raw.get("model_state_dict", raw) if isinstance(raw, dict) else raw
    config = raw.get("config", {}) if isinstance(raw, dict) else {}
    sd = {k: v.numpy() for k, v in sd.items()}

    if args.model == "unet28":
        variables = ti.import_unet28(sd)
    elif args.model == "conditional_unet28":
        variables = ti.import_unet28(sd, conditional=True)
        config.setdefault("num_classes", 10)
    elif args.model == "vae_mnist":
        variables = ti.import_vae_mnist(sd)
    elif args.model == "mlp_unet":
        variables = ti.import_mlp_unet(sd)
    else:
        variables = ti.import_dit(sd)

    params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
    batch_stats = jax.tree_util.tree_map(
        jnp.asarray, variables.get("batch_stats", {})
    )
    tx = optax.adam(float(config.get("learning_rate", 1e-3)))
    state = DiffusionTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=jax.random.PRNGKey(0),
    )
    save_checkpoint(args.out, state, config=config,
                    metadata={"imported_from": args.pth, "model": args.model})
    n = sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
    print(f"imported {args.model} ({n:,} params) from {args.pth} -> {args.out}")


if __name__ == "__main__":
    main()
