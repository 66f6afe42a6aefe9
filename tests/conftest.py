"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (no multi-chip TPU
hardware in CI); the driver separately dry-runs `__graft_entry__.
dryrun_multichip`.

NOTE: the session's sitecustomize imports jax at interpreter startup with
the TPU plugin selected, so JAX_PLATFORMS in os.environ is captured before
this file runs — the platform must be forced through jax.config instead.
XLA_FLAGS is still read lazily at backend init, so setting it here works.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from orb_slam_cuda_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
