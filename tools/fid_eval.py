"""FID evaluation for pixel-space diffusion checkpoints.

The reference verifies sample quality by eye (per-epoch PNG grids,
diffusion.py:242-250); this tool puts a number on it. It trains (once,
cached as a checkpoint) a small MNIST classifier, fits a feature-space
Gaussian to the held-out real test set, then scores any requested sampler
variants of a trained checkpoint against it:

  python tools/fid_eval.py --checkpoint checkpoints/diffusion_final \
      --variants ddpm,ddim50,ddim10,ddpm-bf16 --n 4096

Variant grammar: ``ddpm`` (reference-faithful 1000-step ancestral chain),
``ddimK`` (K-step DDIM serving path), ``dpmppK`` (K-step second-order
DPM-Solver++(2M)), and an optional ``-bf16`` suffix for
a bfloat16 chain carry (the shipped default is an fp32 carry over a bf16
model forward — the suffix exists to QUANTIFY why: see BASELINE.md).

Calibration rows printed alongside: FID of a real train-set subset vs the
test set (the floor achievable by perfect samples at this n) and of pure
N(0,1) noise images (the ceiling).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_variant(token: str):
    """'ddpm' | 'ddimK' | 'dpmppK' with optional '-bf16'
    -> (method, steps, dtype_name)."""
    dtype = "float32"
    if token.endswith("-bf16"):
        token, dtype = token[: -len("-bf16")], "bfloat16"
    if token == "ddpm":
        return "ddpm", 0, dtype
    for method, default_steps in (("dpmpp", 20), ("ddim", 50)):
        if token.startswith(method):
            steps = int(token[len(method):] or default_steps)
            if steps < 1:
                raise ValueError(f"{method} steps must be >= 1, got {steps}")
            return method, steps, dtype
    raise ValueError(f"unknown sampler variant {token!r}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--classifier", default="checkpoints/fid_classifier",
                        help="feature-net checkpoint; trained here if absent")
    parser.add_argument("--variants", default="ddpm,ddim50",
                        help="comma list: ddpm | ddimK | dpmppK, "
                             "optional -bf16 suffix")
    parser.add_argument("--n", type=int, default=4096,
                        help="generated samples per variant")
    parser.add_argument("--sample-batch", type=int, default=128)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data-root", default="./data")
    parser.add_argument("--guidance-scale", type=float, default=1.0)
    parser.add_argument("--json-out", default=None,
                        help="also append one JSON line per row here")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tinydiffusion_tpu.data.mnist import load_mnist
    from tinydiffusion_tpu.eval.fid import (
        FeatureNet,
        classifier_accuracy,
        featurize,
        fid_from_stats,
        frechet_gaussian_stats,
        train_feature_net,
    )
    from tinydiffusion_tpu.experiments.common import (
        load_latent_checkpoint,
        load_pixel_checkpoint,
        make_latent_pixel_sampler,
        make_sampler,
        resolve_dtype,
    )
    from tinydiffusion_tpu.io.checkpoint import (
        checkpoint_exists,
        load_sidecar,
        restore_checkpoint,
        save_checkpoint,
    )

    variants = [parse_variant(v) for v in args.variants.split(",") if v]

    # --- feature net: restore or train-once-and-cache -----------------
    x_train, y_train = load_mnist(args.data_root, train=True)
    x_test, y_test = load_mnist(args.data_root, train=False)
    model = FeatureNet()
    if checkpoint_exists(args.classifier):
        template = jax.device_get(
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)))
        )["params"]
        clf_params = restore_checkpoint(args.classifier, template)
        print(f"loaded feature net from {args.classifier}")
    else:
        print("training feature net (3 epochs)...")
        model, clf_params = train_feature_net(x_train, y_train)
        acc = classifier_accuracy(model, clf_params, x_test, y_test)
        save_checkpoint(args.classifier, clf_params,
                        config={"feature_dim": model.feature_dim},
                        metadata={"test_accuracy": acc})
        print(f"feature net test accuracy {acc:.4f} -> {args.classifier}")

    real_stats = frechet_gaussian_stats(
        featurize(model, clf_params, x_test)
    )

    rows = []

    def report(name, feats_or_fid, label_acc=None):
        fid = (
            feats_or_fid
            if isinstance(feats_or_fid, float)
            else fid_from_stats(*real_stats, *frechet_gaussian_stats(feats_or_fid))
        )
        row = {"variant": name, "fid": round(fid, 4), "n": args.n,
               "guidance_scale": args.guidance_scale}
        acc_txt = ""
        if label_acc is not None:
            row["label_acc"] = round(label_acc, 4)
            acc_txt = f"   label-acc {label_acc:6.1%}"
        rows.append(row)
        print(f"  {name:<16s} FID {fid:8.3f}{acc_txt}")
        return fid

    # Calibration rows: what FID looks like for perfect and for garbage
    # samples at this sample count.
    rng = np.random.default_rng(args.seed)
    idx = rng.permutation(len(x_train))[: args.n]
    print(f"FID vs {len(x_test)} held-out real images (feature dim "
          f"{model.feature_dim}):")
    report("real-train", featurize(model, clf_params, x_train[idx]))
    report("noise", featurize(
        model, clf_params,
        rng.standard_normal((args.n, 28, 28, 1)).astype(np.float32),
    ))

    # --- sampler variants ---------------------------------------------
    # The sidecar's 'backbone' key marks a latent-family checkpoint
    # (latent chain + VAE decode); pixel checkpoints sample directly.
    is_latent = "backbone" in load_sidecar(args.checkpoint).get("config", {})
    if is_latent:
        loaded = load_latent_checkpoint(args.checkpoint)
        conditional = True
        if args.guidance_scale != 1.0:
            parser.error("--guidance-scale applies to pixel CFG checkpoints")
    else:
        loaded = load_pixel_checkpoint(args.checkpoint)
        conditional = loaded["conditional"]
    print(f"loaded {args.checkpoint} (step {int(loaded['state'].step)})")

    batch = args.sample_batch
    for method, steps, dtype_name in variants:
        name = (f"{method}{steps if method != 'ddpm' else ''}"
                + ("-bf16" if dtype_name == "bfloat16" else ""))
        if is_latent:
            latent_fn = make_latent_pixel_sampler(
                loaded, batch, method=method, sample_steps=steps,
                dtype=resolve_dtype(dtype_name),
            )

            def sampler(params, batch_stats, sk, y=None, _fn=latent_fn):
                return _fn(sk, y)
        else:
            sampler = make_sampler(
                loaded["model"], loaded["schedule"], (batch, 28, 28, 1),
                conditional=conditional, dtype=resolve_dtype(dtype_name),
                method=method, sample_steps=steps,
                guidance_scale=args.guidance_scale,
                null_label=(
                    loaded["num_classes"] if loaded["cfg_trained"] else None
                ),
                prediction=loaded["cfg"].get("prediction", "eps"),
            )
        key = jax.random.PRNGKey(args.seed)
        chunks, ys = [], []
        for start in range(0, args.n, batch):
            key, sk, yk = jax.random.split(key, 3)
            kwargs = {}
            if conditional:
                kwargs["y"] = jax.random.randint(
                    yk, (batch,), 0, loaded["num_classes"]
                )
                ys.append(np.asarray(kwargs["y"]))
            chunks.append(np.asarray(
                sampler(loaded["params"], loaded["state"].batch_stats, sk,
                        **kwargs),
                np.float32,
            ))
        gen = np.clip(np.concatenate(chunks)[: args.n], -1.0, 1.0)
        # For conditional checkpoints, also report how often the classifier
        # agrees the sample IS the requested class — the conditioning-
        # fidelity axis FID alone can't see (CFG trades it against
        # diversity; sweep --guidance-scale to map the tradeoff).
        label_acc = (
            classifier_accuracy(
                model, clf_params, gen, np.concatenate(ys)[: args.n]
            )
            if conditional
            else None
        )
        report(name, featurize(model, clf_params, gen), label_acc)

    if args.json_out:
        with open(args.json_out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
