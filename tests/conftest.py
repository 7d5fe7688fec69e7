"""Test environment: CPU backend with 8 virtual devices.

The CPU-backend analog of the reference's RT64_MINIMAL/WARP headless
configuration (SURVEY.md section 4): correctness tests run on the JAX
CPU backend; the 8 virtual devices exercise the multi-chip sharding
paths without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


# The axon TPU plugin force-sets jax_platforms to "axon,cpu" during
# import, overriding the JAX_PLATFORMS env var — so the env var alone
# does NOT pin tests to CPU. Override the config after import.
# RT64TPU_TEST_TPU=1 skips the pin so device-only gates
# (test_precision_tpu.py) run on real hardware.
import jax  # noqa: E402

if not os.environ.get("RT64TPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeat suite runs skip the (dominant)
# full-frame XLA compiles. NOTE this jax version ignores the
# JAX_COMPILATION_CACHE_DIR env var when it is set after process start;
# the config update is the reliable path.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

