"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so sharding paths
(mesh/pjit/shard_map) are exercised without TPU hardware. Environment must be
set before jax is first imported anywhere in the test process.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize registers the axon TPU backend and overrides
# jax_platforms at interpreter start; re-force CPU before any backend init so
# tests never touch the tunnelled TPU (slow remote compiles, bf16 numerics).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Tiered runs (VERDICT r3 item 7): every test in these files exceeds ~60 s
# on the 1-core host (full-suite --durations data), so the whole file is
# auto-marked `slow`. Quick gate: `pytest -m "not slow"` (~10 min); CI and
# pre-round validation run everything. Individual tests elsewhere can still
# opt in with @pytest.mark.slow.
SLOW_FILES = {
    "test_activation_parity.py",
    "test_convert_propainter.py",
    "test_convert_raft.py",
    "test_e2e_reference_diff.py",
    "test_propainter.py",
    "test_propainter_trainer.py",
    "test_train.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.path.name in SLOW_FILES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def cpu_mesh():
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devices = np.array(jax.devices()).reshape(4, 2)
    with Mesh(devices, ("data", "model")) as mesh:
        yield mesh
