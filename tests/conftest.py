"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere (SURVEY.md section 4
item 4: distributed-without-a-cluster testing).
"""

import os

# Force CPU: the ambient environment pins the axon TPU platform (something in
# interpreter startup prepends "axon" to jax_platforms even over an explicit
# JAX_PLATFORMS=cpu env var), so the env var alone is not enough — we must
# also update the jax config after import, before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
