"""Loss-curve plots from an experiment's metrics.jsonl.

Renders the per-epoch train/validation loss curves (and, when present,
the logged per-epoch component maxima) from the JSONL stream that
obs.metrics.MetricsLogger writes. Produces the loss-curve artifacts the
reference shows in wandb dashboards (SURVEY.md section 2 #16) as
offline PNGs.

Usage:
  python tools/plot_losses.py runs/vae_laion_r3_full/vae_laion/metrics.jsonl \
      --out static/vae_laion_256_loss_curve.png --title "LAION conv-VAE 256x256"
"""

from __future__ import annotations

import argparse
import json

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# Colorblind-safe two-series pair (blue=train, orange=val) on a white
# surface; text/grid in neutral ink — identity is never color-alone (the
# legend names both series).
C_TRAIN = "#2563eb"
C_VAL = "#ea580c"
INK = "#374151"
GRID = "#e5e7eb"

# Experiments differ in epoch-summary key names: the VAEs log
# train_loss/test_loss, the diffusion loops epoch_train_loss/val_loss.
TRAIN_KEYS = ("train_loss", "epoch_train_loss")
VAL_KEYS = ("test_loss", "val_loss")


def load_epochs(path: str) -> list[dict]:
    """Epoch-level records: rows carrying an epoch summary loss."""
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if any(k in rec for k in TRAIN_KEYS + VAL_KEYS):
                rows.append(rec)
    return rows


def _style(ax):
    ax.grid(True, color=GRID, linewidth=0.8)
    ax.set_axisbelow(True)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(GRID)
    ax.tick_params(colors=INK, labelsize=9)
    ax.xaxis.label.set_color(INK)
    ax.yaxis.label.set_color(INK)


def plot(rows: list[dict], out: str, title: str) -> None:
    epochs = [r.get("epoch") for r in rows]
    train_key = next((k for k in TRAIN_KEYS if any(k in r for r in rows)), None)
    train = [r.get(train_key) for r in rows]
    val_key = next((k for k in VAL_KEYS if any(k in r for r in rows)), None)

    components = [k for k in ("bce_epoch_max", "kld_epoch_max", "perceptual_epoch_max")
                  if any(k in r for r in rows)]
    n_panels = 1 + bool(components)
    fig, axes = plt.subplots(1, n_panels, figsize=(5.2 * n_panels, 3.6), dpi=150)
    axes = [axes] if n_panels == 1 else list(axes)

    ax = axes[0]
    ax.plot(epochs, train, color=C_TRAIN, linewidth=1.6, label="train")
    if val_key:
        val = [r.get(val_key) for r in rows]
        ax.plot(epochs, val, color=C_VAL, linewidth=1.6, label="validation")
        best = min((v, e) for v, e in zip(val, epochs) if v is not None)
        ax.scatter([best[1]], [best[0]], s=28, color=C_VAL, zorder=3)
        at_right = best[1] > (max(epochs) + min(epochs)) / 2
        ax.annotate(f"best {best[0]:.4g} @ ep{best[1]:.0f}",
                    xy=(best[1], best[0]),
                    xytext=(-6 if at_right else 6, 8),
                    ha="right" if at_right else "left",
                    textcoords="offset points", fontsize=8, color=INK)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend(frameon=False, fontsize=9, labelcolor=INK)
    _style(ax)

    if components:
        ax2 = axes[1]
        # Components span orders of magnitude -> log scale, one axis.
        comp_colors = {"bce_epoch_max": C_TRAIN, "kld_epoch_max": C_VAL,
                       "perceptual_epoch_max": "#059669"}
        for key in components:
            ys = [r.get(key) for r in rows]
            ax2.plot(epochs, ys, color=comp_colors[key], linewidth=1.4,
                     label=key.replace("_epoch_max", " (epoch max)"))
        ax2.set_yscale("log")
        ax2.set_xlabel("epoch")
        ax2.set_ylabel("component (log)")
        ax2.legend(frameon=False, fontsize=8, labelcolor=INK)
        _style(ax2)

    fig.suptitle(title, fontsize=11, color=INK)
    fig.tight_layout()
    fig.savefig(out, bbox_inches="tight")
    print(f"wrote {out} ({len(rows)} epoch records)")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("metrics", help="path to a metrics.jsonl")
    parser.add_argument("--out", required=True)
    parser.add_argument("--title", default="training loss")
    args = parser.parse_args()
    rows = load_epochs(args.metrics)
    if not rows:
        raise SystemExit(f"no epoch-level records in {args.metrics}")
    plot(rows, args.out, args.title)


if __name__ == "__main__":
    main()
