"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU with 8 virtual devices so sharding/pjit paths are
exercised without TPU hardware.  The axon TPU plugin (sitecustomize)
programmatically sets ``jax_platforms="axon,cpu"``; we override it back to
pure CPU before any backend initialises.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat test runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# repo root on sys.path so `import genre_shapehd_tpu` works from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
