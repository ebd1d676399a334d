"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-only unit tier (SURVEY.md §4) and adds the
multi-chip tier the reference never needed: sharding tests run against
8 virtual CPU devices via XLA_FLAGS.
"""

import os

# Must be set before jax initializes. Force-override at both the env and
# config level: the ambient environment pins JAX_PLATFORMS to the real TPU
# tunnel (and the tunnel plugin re-overrides the env var at import), but unit
# tests run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    from tgm_tpu.util.seed import seed_everything

    seed_everything(1337)
    yield


@pytest.fixture
def tiny_events():
    """A tiny hand-built event set used across core/data tests."""
    edge_time = np.array([1, 1, 2, 5, 5, 8, 9, 20], dtype=np.int64)
    edge_index = np.array(
        [[0, 1], [1, 2], [2, 3], [3, 0], [1, 3], [0, 2], [2, 1], [3, 1]], dtype=np.int64
    )
    edge_x = np.arange(16, dtype=np.float32).reshape(8, 2)
    return edge_time, edge_index, edge_x
