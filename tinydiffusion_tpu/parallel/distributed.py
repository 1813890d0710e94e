"""Multi-host initialization — the DCN leg of the parallelism story.

Single-host multi-chip needs nothing (the Mesh covers all local devices over
ICI). Across hosts, JAX needs ``jax.distributed.initialize`` before any
backend touch; after that the SAME jitted step functions and meshes span all
processes (each host feeds its addressable shard of the batch).

This environment has one chip, so the path is exercised only as far as the
no-op guard; the contract is documented and the call sites are real.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger("tinydiffusion.distributed")

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize multi-host JAX when the standard env vars are present.

    Reads ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` (or relies on jax's own cloud auto-detection when
    ``TINYDIFF_DISTRIBUTED=1``). Returns True if distributed mode is active.
    Safe to call multiple times and on single-host setups (no-op).
    """
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    auto = os.environ.get("TINYDIFF_DISTRIBUTED") == "1"
    if not coord and not auto:
        return False
    kwargs = {}
    if coord:
        kwargs = dict(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return True


def local_batch_slice(global_batch: int) -> int:
    """Per-process batch size under multi-host data parallelism."""
    return global_batch // jax.process_count()
