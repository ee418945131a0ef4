"""Test harness config.

Tests run on CPU with 8 virtual XLA devices — the single-box stand-in for a
TPU slice (the same trick the reference uses by running ``mpirun -np N`` on
one machine, SURVEY.md §4.5). Pallas kernels run in interpreter mode on CPU
(snail_tpu.ops picks this automatically from the backend).
"""

import os

# Force CPU regardless of the ambient axon TPU tunnel (its sitecustomize
# registers the plugin at interpreter start and overrides JAX_PLATFORMS, so
# a config update after import is the only reliable off-switch). Set
# SNAIL_TEST_TPU=1 to run the suite against hardware.
if not os.environ.get("SNAIL_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def box_scene():
    from snail_tpu.scene import load_wavefront_obj

    return load_wavefront_obj("/root/reference/scenes/box.obj")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
