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

# ---------------------------------------------------------------------------
# XLA cache-serialize segfault guard.
#
# Known failure mode (CLAUDE.md): for SOME executables XLA's
# ``LoadedExecutable.serialize()`` segfaults deterministically on this CPU
# backend, killing the whole pytest process from INSIDE
# ``compilation_cache.put_executable_and_time`` (observed for the dp4×tp2
# trainer-step executable).  A segfault can't be caught in-process, so make
# it self-explaining instead: every cache WRITE first drops a breadcrumb
# naming the running test.  If pytest ever dies with
# ``Segmentation fault`` mid-suite again, read this file and scope the
# ``no_persistent_compile_cache`` fixture below to the module it names.
_CACHE_WRITE_BREADCRUMB = "/tmp/jax_test_cache_last_write.txt"


def _install_cache_write_breadcrumb() -> None:
    from jax._src import compilation_cache as _cc

    orig = _cc.put_executable_and_time

    def put_with_breadcrumb(cache_key, module_name, executable, backend,
                            compile_time):
        try:
            with open(_CACHE_WRITE_BREADCRUMB, "w") as f:
                f.write(
                    "last persistent-compile-cache WRITE attempted by:\n"
                    f"  test:   {os.environ.get('PYTEST_CURRENT_TEST', '?')}\n"
                    f"  module: {module_name}\n\n"
                    "If pytest just died with a segfault (XLA "
                    "LoadedExecutable.serialize(), see CLAUDE.md), apply "
                    "tests/conftest.py::no_persistent_compile_cache to the "
                    "test module named above.\n")
        except OSError:
            pass
        return orig(cache_key, module_name, executable, backend,
                    compile_time)

    _cc.put_executable_and_time = put_with_breadcrumb


_install_cache_write_breadcrumb()


@pytest.fixture(scope="module")
def no_persistent_compile_cache():
    """Disable persistent-compile-cache writes for one test module.

    Request (e.g. via a module-local autouse alias) from any module whose
    executables hit the XLA serialize segfault — currently
    tests/trainer_e2e_impl.py (run via the test_trainer_e2e.py subprocess
    wrapper).  Setting the config alone is NOT enough:
    jax caches the initialized CacheInterface (and the is_cache_used bit)
    in module globals, so once any earlier test compiled anything the dir
    change is ignored; ``reset_cache()`` drops that sticky state so the
    None dir takes effect, and a second reset on teardown lets later
    modules reinitialize with the restored dir.
    """
    from jax._src import compilation_cache as cc

    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    cc.reset_cache()
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
    cc.reset_cache()


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
