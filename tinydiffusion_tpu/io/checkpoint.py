"""Checkpointing via Orbax: full-state save/restore + best-metric policy.

The reference has two formats (SURVEY.md section 2 #17): a bare
``state_dict`` saved on best val loss (conditional_diffusion.py:297-303) and
a rich dict ``{epoch, model_state_dict, optimizer_state_dict, loss, config}``
for VAEs (vae.py:165-180), with consumers round-tripping the config
(latent_diffusion.py:422-430). It cannot resume optimizer state or RNG for
the diffusion models.

Here every checkpoint is the rich format: an arbitrary pytree of arrays
(params, batch_stats, opt_state, step, rng) written atomically by Orbax, with
a JSON sidecar for the config and scalar metadata — so a killed run resumes
exactly (optimizer + PRNG + step), which the reference cannot do.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(
    path: str,
    state: Any,
    config: Optional[Mapping[str, Any]] = None,
    metadata: Optional[Mapping[str, Any]] = None,
) -> None:
    """Atomically write ``state`` (pytree of arrays) and a JSON sidecar."""
    path = _abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    sidecar = {"config": dict(config or {}), "metadata": dict(metadata or {})}
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2, default=str)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by ``save_checkpoint``. ``template`` supplies
    structure/shapes/dtypes (e.g. a freshly initialized state)."""
    path = _abspath(path)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)


def load_sidecar(path: str) -> dict:
    with open(_abspath(path) + ".json") as f:
        return json.load(f)


def checkpoint_exists(path: str) -> bool:
    path = _abspath(path)
    return os.path.isdir(path) and os.path.exists(path + ".json")


class BestKeeper:
    """Best-validation-loss checkpoint policy (conditional_diffusion.py:297-303).

    ``update`` saves only when the metric improves; mirrors the reference's
    min-val-loss selection while persisting the full resumable state.
    """

    def __init__(self, path: str, mode: str = "min"):
        self.path = path
        self.mode = mode
        self.best: Optional[float] = None

    def update(
        self,
        metric: float,
        state: Any,
        config: Optional[Mapping[str, Any]] = None,
        **metadata: Any,
    ) -> bool:
        metric = float(np.asarray(metric))
        better = (
            self.best is None
            or (self.mode == "min" and metric < self.best)
            or (self.mode == "max" and metric > self.best)
        )
        if better:
            self.best = metric
            save_checkpoint(
                self.path, state, config=config, metadata={"metric": metric, **metadata}
            )
        return better
