"""Device mesh + sharding helpers — the framework's parallelism layer.

The reference is strictly single-device (SURVEY.md section 2.1: no
torch.distributed / NCCL / DDP anywhere). The TPU-native equivalent is not a
communication backend but a **named-axis device mesh**: batches are sharded
over the ``data`` axis, parameters are replicated (or sharded over ``model``
for tensor parallelism), and XLA inserts the all-reduces over ICI when the
jitted train step computes gradients. Multi-host extends the same program
over DCN via ``jax.distributed.initialize`` — no code changes in the step
function.

Axes:
  - ``data``  — batch sharding (the working, tested axis; DP).
  - ``model`` — optional tensor-parallel axis for param sharding; plumbed
    through so TP/FSDP-style layouts are expressible. The reference's
    capability surface never needs it (models are <30M params), so it
    defaults to size 1.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over (by default) all local devices.

    With one axis, all devices go to that axis. With two axes and no shape,
    devices go to ``data`` and ``model`` gets size 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    assert int(np.prod(shape)) == len(devices), (
        f"mesh shape {shape} != {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def make_mesh_for_batch(batch_size: int, axes: Sequence[str] = ("data",)) -> Mesh:
    """Mesh whose data axis divides ``batch_size``.

    XLA batch sharding needs dim0 % n_devices == 0; small reference configs
    (e.g. vae_laion's batch 4, vae_laion.py:30) may not cover every device —
    use the largest device count that divides the batch (worst case 1), and
    say so out loud: silently idling chips is a perf bug waiting to be
    misread as a compiler problem."""
    import math

    devices = jax.devices()
    n = math.gcd(batch_size, len(devices))
    if n < len(devices):
        import logging

        logging.getLogger("tinydiffusion.mesh").warning(
            "batch_size=%d does not divide %d devices; using a %d-device mesh "
            "(%d devices idle). Pick a batch divisible by the device count to "
            "use the full slice.",
            batch_size, len(devices), n, len(devices) - n,
        )
    return make_mesh(axes, shape=[n] + [1] * (len(axes) - 1), devices=devices[:n])


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a batch-leading array: dim 0 split over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params / optimizer state under pure DP)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Device-put a pytree of host arrays with the batch dim sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def infer_state_sharding(state: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Tensor-parallel sharding rule for a train-state pytree.

    Shards every float array whose LAST dimension (output features for Dense
    kernels, conv output channels, embedding width, biases, BN params, and —
    because optimizer moments mirror param shapes — Adam mu/nu) divides the
    ``model`` axis size; everything else (scalars, PRNG keys, odd shapes like
    the UNet's 1-channel head) replicates. XLA/GSPMD then propagates the
    layouts through the step function and inserts the ICI collectives.

    The reference has no model parallelism at all (SURVEY.md §2.1); this is
    the expressible-by-design axis — DP remains the primary working axis for
    the reference-scale models.
    """
    if axis not in mesh.shape or mesh.shape[axis] == 1:
        return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), state)
    msize = mesh.shape[axis]

    def rule(leaf):
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and jnp_issubdtype_inexact(leaf)
            and leaf.shape[-1] >= msize
            and leaf.shape[-1] % msize == 0
        ):
            return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1)), axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, state)


def jnp_issubdtype_inexact(leaf) -> bool:
    try:
        return np.issubdtype(leaf.dtype, np.inexact)
    except Exception:
        return False


def apply_sharding(tree: Any, shardings: Any) -> Any:
    """device_put a pytree onto per-leaf shardings (same structure)."""
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
