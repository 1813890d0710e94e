"""Experiment tracking: console + JSONL always on, wandb when available.

The reference logs to wandb in 6 of 7 scripts (e.g.
conditional_diffusion.py:211-219, 272, 341-348) with per-script project names
and keys like ``train_loss`` / ``val_loss`` / ``batch_train_loss``. wandb is
not installed in this environment, so the logger degrades gracefully: every
run always writes ``<run_dir>/metrics.jsonl`` (one JSON object per log call,
with step and wall time) and prints a compact console line; if wandb imports
and ``WANDB_MODE`` permits, it mirrors the same keys there.

Also hosts the throughput counters (samples/sec/chip) used by bench.py —
observability the reference lacks entirely (SURVEY.md section 5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping, Optional


class MetricsLogger:
    def __init__(
        self,
        project: str,
        run_dir: str = "runs",
        config: Optional[Mapping[str, Any]] = None,
        use_wandb: bool = True,
        quiet: bool = False,
    ):
        self.project = project
        self.run_dir = os.path.join(run_dir, project)
        os.makedirs(self.run_dir, exist_ok=True)
        self.quiet = quiet
        self._t0 = time.time()
        self._jsonl = open(os.path.join(self.run_dir, "metrics.jsonl"), "a")
        if config:
            with open(os.path.join(self.run_dir, "config.json"), "w") as f:
                json.dump(dict(config), f, indent=2, default=str)
        self._wandb = None
        if use_wandb and os.environ.get("WANDB_MODE", "") != "disabled":
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(project=project, config=dict(config or {}))
            except Exception:
                self._wandb = None

    def log(self, metrics: Mapping[str, Any], step: Optional[int] = None) -> None:
        scalars = {
            k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()
        }
        record = {"t": round(time.time() - self._t0, 3), **scalars}
        if step is not None:
            record["step"] = int(step)
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if not self.quiet:
            parts = [
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()
            ]
            print(f"[{self.project}] " + " ".join(parts))
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def log_image(self, key: str, path: str, step: Optional[int] = None) -> None:
        self.log({key: path}, step=step)
        if self._wandb is not None:
            try:
                import wandb  # type: ignore

                self._wandb.log({key: wandb.Image(path)}, step=step)
            except Exception:
                pass

    def finish(self) -> None:
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()


class LossAccumulator:
    """Accumulates per-step loss scalars WITHOUT forcing a host sync.

    ``float(loss)`` per batch costs a device round-trip per step (~1 ms
    tunnel RTT on this backend — measured +42 ms/step on the MNIST train
    loop). ``add`` just buffers the device scalar (zero dispatches — a
    per-step device-side running sum costs +15 ms/step on this tunnel, and
    ``jnp.stack`` of N buffered scalars ~44 ms per buffer); ``mean()`` /
    ``sum()`` fetch everything in one ``jax.device_get`` at epoch end
    (measured: indistinguishable from not accumulating at all).
    ``last()`` syncs a single scalar — log-point cadence only. The epoch
    fetch blocks on the final (donated, chained) step, so it doubles as a
    real completion fence (see obs/profiling.force) — read throughput
    counters after it.
    """

    def __init__(self):
        self.reset()

    def add(self, loss) -> None:
        self._vals.append(loss)
        self._n += 1

    def add_many(self, losses) -> None:
        """Buffer a whole (K,) per-step loss vector from a multi-step
        dispatch as ONE object. Slicing ``losses[j]`` per step looks free
        but each jnp slice is its own tiny device program on this backend
        (~60 extra dispatches per 10-step group in the conv-VAE resident
        loop); buffering the vector keeps the group at one dispatch."""
        self._vals.append(losses)
        self._n += int(losses.shape[0])

    def last(self) -> float:
        """Most recent loss as a host float (one sync — log-point cadence)."""
        if not self._vals:
            return 0.0
        import numpy as np
        import jax

        v = np.atleast_1d(np.asarray(jax.device_get(self._vals[-1]), np.float64))
        return float(v[-1])

    @property
    def count(self) -> int:
        return self._n

    def _fetch(self):
        import jax
        import numpy as np

        vals = jax.device_get(self._vals)
        return np.concatenate(
            [np.atleast_1d(np.asarray(v, np.float64)) for v in vals]
        )

    def sum(self) -> float:
        """Epoch total (one bulk fetch; doubles as a completion fence)."""
        return float(self._fetch().sum()) if self._vals else 0.0

    def mean(self) -> float:
        return float(self._fetch().mean()) if self._vals else 0.0

    def values(self):
        """All buffered values as a host array (one bulk fetch) — for
        epoch-end robust statistics (maxima, non-finite filtering)."""
        import numpy as np

        return self._fetch() if self._vals else np.zeros((0,), np.float64)

    def finite_mean_and_bad_count(self):
        """Mean over FINITE entries + how many were non-finite.

        Episodic latent blow-ups can leave a handful of Inf eval batches;
        averaging them in reports test_loss=Inf for the whole epoch and
        blinds best-model selection. Callers log the bad count so the skip
        is visible, not silent."""
        import numpy as np

        vals = self.values()
        finite = vals[np.isfinite(vals)]
        bad = int(len(vals) - len(finite))
        return (float(finite.mean()) if len(finite) else float("inf")), bad

    def reset(self) -> None:
        self._vals: list = []
        self._n: int = 0


class Throughput:
    """Rolling samples/sec counter (calls ``block_until_ready`` nowhere —
    callers should sync before stopping the clock for honest numbers)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._start = time.perf_counter()
        self._samples = 0

    def add(self, n: int):
        self._samples += n

    @property
    def samples_per_sec(self) -> float:
        dt = time.perf_counter() - self._start
        return self._samples / dt if dt > 0 else 0.0
