"""Test harness: run everything on a virtual 8-device CPU mesh (SURVEY.md §4).

Multi-chip code paths (shard_map pose-graph, sharded map) are exercised without
TPU hardware by forcing the host platform to expose 8 XLA CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone is not enough when a TPU PJRT plugin (axon) is installed —
# the config must be set before first device access.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from radarslampy_tpu.config import SlamConfig


@pytest.fixture(scope="session")
def cfg():
    return SlamConfig()


@pytest.fixture(scope="session")
def small_cfg():
    """Shrunken config for fast CPU tests (512x512 Cartesian grid)."""
    return SlamConfig(cart_size=512, cart_downsample=8, n_candidates=256,
                      anms_top_k=100, k_max=128)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


TINY_ROOT = "/root/reference/data"


def tiny_available():
    return os.path.isdir(os.path.join(TINY_ROOT, "tiny", "radar"))
