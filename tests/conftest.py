"""Test harness: CPU backend with 8 fake devices.

The standard JAX substitute for multi-chip hardware (SURVEY.md §4): mesh /
sharding / psum logic is validated on a virtual 8-device CPU backend.

This environment's sitecustomize force-registers the axon TPU backend and sets
``jax_platforms="axon,cpu"`` at interpreter start, so env vars alone are not
enough — override the config again here (before any backend is initialized).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated suite runs skip the expensive CPU
# compiles of the train-step graphs
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", (
    f"tests must run on CPU, got {jax.devices()}")
if jax.device_count() < 8:  # pragma: no cover
    import warnings
    warnings.warn(f"only {jax.device_count()} CPU devices; mesh tests may skip")


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_conv_compute():
    """set_conv_compute is process-global; the train CLI's default
    `precision: bf16` must not leak bf16 convs into parity tests that run
    later in the same process."""
    yield
    from jax import lax
    from munit_tpu.core import ops
    ops.set_conv_compute(None, lax.Precision.HIGHEST)
