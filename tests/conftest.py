"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container pins JAX_PLATFORMS=axon and a sitecustomize that registers
the axon (remote-TPU-tunnel) PJRT plugin in every python process. For the
unit-test suite we want the local CPU backend (fast local compiles, exact
fp32): force JAX_PLATFORMS=cpu and drop the axon backend factory before
any jax computation initializes the backends — otherwise backend discovery
claims the remote chip (~100 s) even when cpu is selected.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

try:  # deregister the axon plugin if the sitecustomize installed it
    import jax
    from jax._src import xla_bridge

    xla_bridge._backend_factories.pop("axon", None)
    # jax was already imported by the sitecustomize, so the env var above
    # came too late for its config; update it through the live config.
    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover - plugin absent or jax internals moved
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
