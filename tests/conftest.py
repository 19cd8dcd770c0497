"""Test harness config: force CPU with 8 virtual devices (SURVEY.md §4).

The container injects a TPU (axon) PJRT plugin through a sitecustomize on
PYTHONPATH which calls ``jax.config.update("jax_platforms", "axon,cpu")`` at
interpreter startup. Tests must run on the host CPU with 8 virtual devices
(multi-chip sharding without hardware), so we point jax back at CPU before
any backend client is created.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():  # a fixture/plugin already touched jax
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(13)  # reference seed (sampling.cpp:3)
