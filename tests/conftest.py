"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Parity and unit tests run on CPU in float32 (deterministic, no TPU needed);
multi-device sharding tests use the 8 virtual devices. Benchmarks run
separately on real TPU hardware via ``bench.py``.
"""

import os

# Force CPU: the environment presets JAX_PLATFORMS=axon (the TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
