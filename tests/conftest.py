"""Test harness config: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere: correctness tests (and the sharding
tests in particular) run on host CPU with 8 virtual devices, per the project
test strategy (SURVEY.md §4) — no TPU pod required.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"  # overwrite: harness presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax and forces jax_platforms="axon,cpu"
# (its register() runs at interpreter start, before env vars are read by us),
# so override the live config too — backends initialise lazily.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from alego_tpu.config import tiny_config  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    return tiny_config()


@pytest.fixture(scope="session")
def world():
    from alego_tpu.utils.synthetic import make_world

    return make_world(seed=3)
