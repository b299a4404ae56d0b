"""Test harness configuration.

The suite runs on the JAX CPU backend with 8 virtual devices so the
multi-chip sharding paths compile and execute without TPU hardware (the
deterministic-CPU stand-in for a fake backend, SURVEY.md §4).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# jax is pre-imported by the environment, so JAX_PLATFORMS in os.environ is
# not enough — force the platform through the config API before any op runs.
# RGBD360_TEST_TPU=1 keeps the real backend so the @skipif(tpu)-gated kernel
# tests (tests/test_warp_kernel.py) can run on hardware.
import jax  # noqa: E402

if os.environ.get("RGBD360_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = "/root/reference"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference data not mounted")
    return REFERENCE_ROOT


@pytest.fixture(scope="session")
def calib(reference_root):
    from rgbd360_tpu.io.calib import Calib360

    return Calib360.load(reference_root)


@pytest.fixture(scope="session")
def sample_frames(calib, reference_root):
    from rgbd360_tpu.core.frame360 import Frame360

    f1 = Frame360(calib, 0).build(os.path.join(reference_root, "samples/sphere_images_1.bin"))
    f2 = Frame360(calib, 1).build(os.path.join(reference_root, "samples/sphere_images_10.bin"))
    return f1, f2


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    return np.random.default_rng(0)
