"""Test environment: force CPU with 8 virtual devices before jax imports.

Multi-device sharding tests run on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) per SURVEY.md §4 so DP/TP
paths are testable without TPU hardware.
"""

import os

# The environment presets JAX_PLATFORMS=axon (the tunneled TPU) and a
# sitecustomize re-registers the axon backend regardless of the env var, so
# the only reliable override is the config update *after* importing jax.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on CPU, got " + jax.default_backend())

# persistent compilation cache: repeated suite runs skip most XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def tiny_unet():
    """A small, CPU-fast SR3 UNet + initialized params (float32)."""
    from sr3d_tpu.models.sr3_unet import SR3UNet

    unet = SR3UNet(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
                   attn_res=(8,), res_blocks=1, dropout=0.0, image_size=16,
                   dtype=jnp.float32)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                       jnp.zeros((1, 1)))
    return unet, params


@pytest.fixture(scope="session")
def tiny_schedule():
    from sr3d_tpu.diffusion.schedules import make_schedule

    return make_schedule("linear", 20, 1e-4, 2e-2)
