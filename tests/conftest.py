"""Test configuration: force an 8-device virtual CPU mesh.

The JAX analogue of the reference's Gloo-on-CPU fake-cluster trick
(SURVEY §4 mechanism 3): multi-device sharding tests run on one CPU host by
splitting it into 8 virtual devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Some environments pre-import jax from sitecustomize with JAX_PLATFORMS
# baked in; the env var alone is then ignored — force via config too.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU compiles of the full train step dominate
# test wall-time; cache them across runs.
_CACHE_DIR = os.environ.get("JAX_TEST_CACHE",
                            "/tmp/custom_yolo_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def tiny_model():
    """Small model instance shared across tests (init is the slow part)."""
    import jax.numpy as jnp
    from custom_yolo_tpu.models import YoloModel

    model = YoloModel(width=(3, 8, 16, 32, 64, 64),
                      depth=(1, 1, 1, 1, 1, 1),
                      csp=(False, True), num_classes=7)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables
