"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding tests run anywhere, and keep numerics float32-exact (the axon TPU
plugin, when present, registers itself at interpreter startup and pins
``jax_platforms=axon,cpu`` — override it through the config API, which wins
over env vars)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(19970808)
