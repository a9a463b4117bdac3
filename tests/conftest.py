"""Test configuration.

Tests run on CPU with a virtual 8-device mesh (the TPU-world analog of a
fake backend — see SURVEY.md §4.5) and float64 enabled so the f64 parity
path against the C reference (all-double) is exact. Production code is
dtype-explicit, so f32 paths still run as f32 under x64.
"""

import os

# Must be set before the CPU backend is initialized. NOTE: this image's
# sitecustomize registers the axon TPU backend at interpreter startup and
# forces JAX_PLATFORMS=axon, so the env var alone is NOT sufficient —
# jax.config.update("jax_platforms", ...) below is what actually pins CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU (f64 parity); got " + str(jax.devices())
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_available() -> bool:
    return os.path.isfile(os.path.join(REFERENCE_DIR, "TerminalRayTracer.c"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
