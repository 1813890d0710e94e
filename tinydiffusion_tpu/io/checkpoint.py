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
import re
from typing import Any, Mapping, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


# --- portable weights format (.npz) ----------------------------------------
#
# Orbax state dirs are the working format (exact resume: params + opt_state +
# rng + step) but they are large and deliberately untracked. The `.npz`
# weights format is the PORTABLE one: the serving subset of the state
# (params / batch_stats / ema_params / step), float params cast to bfloat16
# (batch_stats stay fp32 — BN parity), committed to git so a fresh clone can
# serve and eval every zoo checkpoint with zero training. This mirrors the
# reference's checkpoint-artifact flow (latent_diffusion.py:422-429) where
# trained weights are a distributable file, not a training-session residue.
#
# ``restore_checkpoint`` falls back to `<path>.npz` transparently when the
# Orbax dir is absent, so every loader (generate.py, tools/fid_eval.py,
# experiments/*) reads either format through the same call. Leaves missing
# from the npz (opt_state, rng) keep the template's freshly-initialized
# values — serving never reads them.

_WEIGHTS_FIELDS = ("params", "batch_stats", "ema_params", "step")


def _norm_key(path) -> str:
    """Normalize a key path to '/'-joined name tokens so the same logical
    leaf gets the same key whether it came from a flax struct (GetAttrKey,
    ``.params['Conv_0']``) or the orbax as-saved dict (DictKey,
    ``['params']['Conv_0']``). The separator dots/brackets/quotes are
    stripped; names themselves are [A-Za-z0-9_+-]."""
    return "/".join(re.findall(r"[A-Za-z0-9_+-]+", jax.tree_util.keystr(path)))


def _flat_items(tree: Any) -> tuple[dict, Any]:
    """Flatten a pytree to {normalized-key-path: leaf} + treedef."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    items = {_norm_key(path): leaf for path, leaf in flat}
    if len(items) != len(flat):
        # _norm_key strips separator characters, so two distinct leaves CAN
        # normalize to the same key (e.g. a dict key containing '/'); losing
        # one silently would corrupt the npz. Refuse instead.
        seen: dict = {}
        for path, _ in flat:
            k = _norm_key(path)
            if k in seen:
                raise ValueError(
                    f"npz key collision: {jax.tree_util.keystr(path)!r} and "
                    f"{seen[k]!r} both normalize to {k!r}"
                )
            seen[k] = jax.tree_util.keystr(path)
    return items, treedef


def save_weights(
    path: str,
    state: Any,
    config: Optional[Mapping[str, Any]] = None,
    metadata: Optional[Mapping[str, Any]] = None,
) -> str:
    """Write the serving subset of ``state`` to ``<path>.npz`` (+ sidecar).

    ``state`` is either a full train state (struct or as-saved dict — only
    the _WEIGHTS_FIELDS subtrees are kept) or a bare params tree (kept
    whole, e.g. the FID feature net). Float32/float64 leaves outside
    ``batch_stats`` are cast to bfloat16 and stored as uint16 views (numpy
    has no native bfloat16 in the npz container); everything else is stored
    raw. Returns the npz path.
    """
    path = _abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def field(name):
        if isinstance(state, Mapping):
            return state.get(name)
        return getattr(state, name, None)

    subset = {k: field(k) for k in _WEIGHTS_FIELDS if field(k) is not None}
    tree = subset if subset else state

    items, _ = _flat_items(jax.device_get(tree))
    arrays, bf16_keys = {}, []
    for key, leaf in items.items():
        arr = np.asarray(leaf)
        if arr.dtype in (np.float32, np.float64) and not key.startswith(
            "batch_stats"
        ):
            import ml_dtypes

            arr = arr.astype(ml_dtypes.bfloat16).view(np.uint16)
            bf16_keys.append(key)
        elif arr.dtype == jax.numpy.bfloat16:
            arr = arr.view(np.uint16)
            bf16_keys.append(key)
        arrays[key] = arr
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"bfloat16": bf16_keys}).encode(), dtype=np.uint8
    )
    np.savez(path + ".npz", **arrays)
    if config is not None or not os.path.exists(path + ".json"):
        sidecar = {"config": dict(config or {}), "metadata": dict(metadata or {})}
        with open(path + ".json", "w") as f:
            json.dump(sidecar, f, indent=2, default=str)
    return path + ".npz"


def _load_weights_arrays(path: str) -> dict:
    import ml_dtypes

    with np.load(_abspath(path) + ".npz") as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        bf16 = set(meta.get("bfloat16", ()))
        return {
            k: (z[k].view(ml_dtypes.bfloat16) if k in bf16 else z[k])
            for k in z.files
            if k != "__meta__"
        }


def restore_weights(path: str, template: Any) -> Any:
    """Restore a ``save_weights`` npz into ``template``'s structure.

    Template leaves whose key path matches an npz entry are replaced (cast
    to the template leaf's dtype, shape-checked); leaves with no npz entry
    (opt_state, rng) keep their template values.
    """
    arrays = _load_weights_arrays(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    used = set()
    leaves = []
    for p, leaf in flat:
        key = _norm_key(p)
        if key in arrays:
            arr = arrays[key]
            want = np.shape(leaf)
            if tuple(arr.shape) != tuple(want):
                raise ValueError(
                    f"weights key {key!r}: npz shape {arr.shape} != template "
                    f"shape {want}"
                )
            dtype = getattr(leaf, "dtype", arr.dtype)
            leaves.append(jax.numpy.asarray(arr, dtype=dtype))
            used.add(key)
        else:
            leaves.append(leaf)
    # 'step' is the exact top-level scalar leaf — match it exactly so a
    # weight subtree whose name merely begins with "step" (e.g. a missing
    # step_embed module) still raises the template-mismatch error.
    unused = [k for k in arrays if k not in used and k != "step"]
    if unused:
        raise ValueError(
            f"{path}.npz carries weights the template has no slot for "
            f"(first few: {sorted(unused)[:5]}); template/model mismatch"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


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
    structure/shapes/dtypes (e.g. a freshly initialized state).

    Falls back to the portable ``<path>.npz`` weights file (see
    ``save_weights``) when the Orbax dir is absent — a fresh clone serves
    the committed zoo without retraining."""
    path = _abspath(path)
    if not os.path.isdir(path) and os.path.exists(path + ".npz"):
        def _has(name):
            if isinstance(template, Mapping):
                return template.get(name) is not None
            return getattr(template, name, None) is not None

        if _has("opt_state") or _has("rng"):
            # The npz carries serving weights only. A training-resume caller
            # (template has opt_state/rng) would silently continue with a
            # fresh zero optimizer and template RNG — degraded, not exact.
            print(
                f"WARNING: {path}: Orbax dir absent — restoring portable npz "
                "serving weights only; optimizer state and RNG are "
                "reinitialized (training resume from this point is NOT an "
                "exact continuation)."
            )
        return restore_weights(path, template)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)


def load_sidecar(path: str) -> dict:
    with open(_abspath(path) + ".json") as f:
        return json.load(f)


def checkpoint_exists(path: str) -> bool:
    path = _abspath(path)
    return (
        os.path.isdir(path) or os.path.exists(path + ".npz")
    ) and os.path.exists(path + ".json")


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
