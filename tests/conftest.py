import os

# The package enables a persistent compilation cache; CPU AOT entries are
# machine-feature-specific and this repo's cache may be shared across
# heterogeneous hosts — keep unit tests hermetic.
os.environ.setdefault("SKELSPLAT_NO_COMPILE_CACHE", "1")

# Multi-device SPMD tests run on a virtual 8-device CPU mesh — the standard
# way to validate TPU-style sharding without a pod. Must be set before jax
# initializes. Force-override: the environment's sitecustomize pins
# JAX_PLATFORMS to the remote TPU ('axon'), which would route every unit test
# through the device tunnel. Opt back in with SKELSPLAT_TEST_TPU=1.
if not os.environ.get("SKELSPLAT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# jaxtyping's pytest plugin imports jax before this conftest runs, and jax
# binds JAX_PLATFORMS at import time — so also override via the config API
# (safe: the backend itself is only initialized at first use).
if not os.environ.get("SKELSPLAT_TEST_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
