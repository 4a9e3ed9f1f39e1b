"""Test harness: run everything on CPU with 8 virtual devices so that the
multi-chip sharding paths are exercised without TPU hardware (the driver's
dryrun does the same via xla_force_host_platform_device_count)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")  # env JAX_PLATFORMS may say otherwise
# NO persistent compile cache for tests: executable (de)serialization on the
# 8-virtual-device CPU backend segfaults flakily inside
# compilation_cache.{get,put}_executable_and_time (observed in both the read
# and the write path, fresh cache dir, jaxlib in this image) — and sharing the
# chip runs' cache dir additionally risks corrupt entries from crashed runs.

import numpy as np
import pytest

# paranoid mode: every D.validate() in the pipeline runs the deep per-edge
# invariant checks, so a surgery that breaks an invariant fails its test
from supernova_tpu.asm import supergraph as _sg

_sg.PARANOID = True


@pytest.fixture
def rng():
    return np.random.default_rng(0)
