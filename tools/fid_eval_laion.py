"""Quantitative eval for the LAION 256^2 pair (round-3 VERDICT weak #3).

The reference judges the LAION VAE and text-conditional diffusion by eye
(vae_laion.py:364-392 reconstruction panels; the README's sample grids).
This tool replaces that with FID in the feature space of an RGB
``FeatureNet`` trained on the synthetic LAION classes — the 4 caption
classes exist by construction (data/laion.py:synthesize_caption), so the
feature space is supervised exactly like the MNIST one in tools/fid_eval.py.

Rows it can emit (each gated on what exists):
- calibration floor:   FID(real split A, real split B)  — same distribution
- calibration ceiling: FID(real, uniform noise images)
- vae_recon:           FID(real, conv-VAE reconstructions)
- vae_prior:           FID(real, decode(z ~ N(0, I)))
- samples_dir:         FID(real, PNGs in --samples-dir) — score any sample
  dump (e.g. generate_laion.py output) against the real distribution.

Absolute values are not Inception-FID comparable; relative comparisons and
the floor/ceiling rows are the point. Run on the real TPU.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rgb_channels(size: int):
    """Conv/pool blocks until the spatial side reaches 8 (256 -> 5 blocks)."""
    blocks = max(2, (size // 8).bit_length() - 1)
    widths = (32, 64, 128, 128, 128, 128, 128)
    return widths[:blocks]


def synth_set(n: int, size: int, offset: int = 0):
    """(images uint8 (N, size, size, 3), labels int32) — deterministic.
    ``offset`` shifts the index range so callers can build disjoint splits
    (i % 4 keeps class balance at any multiple-of-4 offset)."""
    import numpy as np

    from tinydiffusion_tpu.data.laion import synthesize_image

    xs = np.stack([synthesize_image(i, size)[0]
                   for i in range(offset, offset + n)])
    ys = (np.arange(offset, offset + n) % 4).astype(np.int32)
    return xs, ys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--vae-checkpoint", default="checkpoints/vae_laion_best")
    parser.add_argument("--classifier", default=None,
                        help="feature-net checkpoint (default "
                             "checkpoints/fid_classifier_rgb<size>); trained "
                             "here and cached when absent")
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--latent-dim", type=int, default=128)
    parser.add_argument("--n", type=int, default=512,
                        help="images per evaluated set")
    parser.add_argument("--n-train", type=int, default=1024,
                        help="feature-net training images")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--samples-dir", default=None,
                        help="directory of PNGs to score against real")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--json-out", default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tinydiffusion_tpu.eval.fid import (
        FeatureNet,
        classifier_accuracy,
        featurize,
        fid_from_stats,
        frechet_gaussian_stats,
        train_feature_net,
    )
    from tinydiffusion_tpu.io.checkpoint import (
        checkpoint_exists,
        restore_checkpoint,
        save_checkpoint,
    )

    size = args.image_size
    channels = rgb_channels(size)
    clf_path = args.classifier or f"checkpoints/fid_classifier_rgb{size}"

    # --- feature net: restore or train-once-and-cache --------------------
    model = FeatureNet(num_classes=4, channels=tuple(channels))
    if checkpoint_exists(clf_path):
        template = jax.device_get(
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
        )["params"]
        clf_params = restore_checkpoint(clf_path, template)
        print(f"loaded feature net from {clf_path}")
    else:
        print(f"training RGB feature net ({args.n_train} imgs, "
              f"channels {channels})...")
        x_tr, y_tr = synth_set(args.n_train, size)
        x_tr = x_tr.astype(np.float32) / 127.5 - 1.0
        model, clf_params = train_feature_net(
            x_tr, y_tr, num_classes=4, channels=tuple(channels),
            batch_size=args.batch, seed=args.seed,
        )
        # Eval split from indices DISJOINT from the 0..n_train-1 training
        # set — otherwise this is train accuracy mislabeled as test.
        x_te, y_te = synth_set(256, size, offset=args.n_train)
        acc = classifier_accuracy(
            model, clf_params, x_te.astype(np.float32) / 127.5 - 1.0, y_te,
            batch_size=args.batch,
        )
        print(f"feature net accuracy: {acc:.4f}")
        save_checkpoint(clf_path, clf_params,
                        config={"feature_dim": 128, "num_classes": 4,
                                "channels": list(channels),
                                "image_size": size},
                        metadata={"test_accuracy": acc})

    rows = {}

    def fid_row(name, gen_m1, real_stats):
        gen_stats = frechet_gaussian_stats(
            featurize(model, clf_params, gen_m1, batch_size=args.batch)
        )
        rows[name] = round(fid_from_stats(*real_stats, *gen_stats), 3)
        print(f"{name}: {rows[name]}")

    # Real reference distribution + calibration rows. Offset indices keep
    # the two real sets disjoint (i % 4 preserves class balance).
    from tinydiffusion_tpu.data.laion import synthesize_image

    real, _ = synth_set(args.n, size)
    real_m1 = real.astype(np.float32) / 127.5 - 1.0
    real_stats = frechet_gaussian_stats(
        featurize(model, clf_params, real_m1, batch_size=args.batch)
    )
    real_b = np.stack([
        synthesize_image(i, size)[0] for i in range(args.n, 2 * args.n)
    ]).astype(np.float32) / 127.5 - 1.0
    fid_row("calibration_floor_real_vs_real", real_b, real_stats)
    noise = np.random.default_rng(args.seed).uniform(
        -1, 1, (args.n, size, size, 3)
    ).astype(np.float32)
    fid_row("calibration_ceiling_real_vs_noise", noise, real_stats)

    # --- conv-VAE rows ----------------------------------------------------
    if checkpoint_exists(args.vae_checkpoint):
        from tinydiffusion_tpu.models.vae_conv import ConvVAE

        vae = ConvVAE(latent_dim=args.latent_dim, image_size=size)
        variables = vae.init(
            jax.random.PRNGKey(0), jnp.zeros((2, size, size, 3)),
            jax.random.PRNGKey(0), train=False,
        )
        serving = {"params": variables["params"],
                   "batch_stats": variables.get("batch_stats", {}),
                   "step": jnp.zeros((), jnp.int32)}
        if os.path.exists(args.vae_checkpoint + ".npz"):
            # Portable serving weights — the committed cold-start artifact.
            from tinydiffusion_tpu.io.checkpoint import restore_weights

            w = restore_weights(args.vae_checkpoint, serving)
        else:
            # Full Orbax state: the opt_state tree depends on how training
            # built its optimizer (adam, clip-chained when clip_norm > 0 —
            # experiments/vae_laion.py:255-257), so rebuild it from the
            # sidecar instead of guessing a bare adam (the bare-adam
            # template failed restore against a clip-chained checkpoint).
            import optax

            from tinydiffusion_tpu.experiments.vae_laion import (
                ConvVAETrainState,
            )
            from tinydiffusion_tpu.io.checkpoint import load_sidecar

            cfg = load_sidecar(args.vae_checkpoint).get("config", {})
            tx = optax.adam(cfg.get("learning_rate", 1e-4))
            if cfg.get("clip_norm", 0):
                tx = optax.chain(
                    optax.clip_by_global_norm(cfg["clip_norm"]), tx
                )
            template = ConvVAETrainState(
                step=jnp.zeros((), jnp.int32),
                params=variables["params"],
                batch_stats=variables.get("batch_stats", {}),
                opt_state=tx.init(variables["params"]),
                rng=jax.random.PRNGKey(0),
            )
            vstate = restore_checkpoint(args.vae_checkpoint, template)
            w = {"params": vstate.params, "batch_stats": vstate.batch_stats,
                 "step": vstate.step}
        print(f"loaded conv-VAE from {args.vae_checkpoint} "
              f"(step {int(w['step'])})")
        vars_eval = {"params": w["params"],
                     "batch_stats": w["batch_stats"]}

        @jax.jit
        def recon(x01, key):
            out, _, _ = vae.apply(vars_eval, x01, key, train=False)
            return out

        @jax.jit
        def decode(z):
            return vae.apply(vars_eval, z, train=False,
                             method=ConvVAE.decode)

        recons, priors = [], []
        key = jax.random.PRNGKey(args.seed + 1)
        for i in range(0, args.n, args.batch):
            xb = jnp.asarray(
                real[i: i + args.batch].astype(np.float32) / 255.0
            )
            key, k1, k2 = jax.random.split(key, 3)
            recons.append(np.asarray(recon(xb, k1)))
            z = jax.random.normal(k2, (xb.shape[0], args.latent_dim))
            priors.append(np.asarray(decode(z)))
        # VAE I/O is [0, 1] (ToTensor parity); featurize wants [-1, 1].
        fid_row("vae_recon", np.concatenate(recons) * 2.0 - 1.0, real_stats)
        fid_row("vae_prior_decode", np.concatenate(priors) * 2.0 - 1.0,
                real_stats)
    else:
        print(f"skip VAE rows ({args.vae_checkpoint} not found)")

    # --- arbitrary sample dump (e.g. generate_laion.py output) -----------
    if args.samples_dir:
        from PIL import Image

        paths = sorted(glob.glob(os.path.join(args.samples_dir, "*.png")))
        if not paths:
            sys.exit(f"no PNGs in {args.samples_dir}")
        imgs = np.stack([
            np.asarray(
                Image.open(p).convert("RGB").resize((size, size))
            ) for p in paths
        ]).astype(np.float32) / 127.5 - 1.0
        fid_row(f"samples_dir[{len(paths)}]", imgs, real_stats)

    print(json.dumps({"image_size": size, "n": args.n, **rows}))
    if args.json_out:
        with open(args.json_out, "a") as f:
            f.write(json.dumps({"image_size": size, "n": args.n, **rows})
                    + "\n")


if __name__ == "__main__":
    main()
