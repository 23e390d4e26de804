"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a fake 8-device mesh
(``xla_force_host_platform_device_count``) so CI needs no real TPU.

NOTE: this environment auto-registers a TPU ("axon") backend from
sitecustomize at interpreter startup — before any conftest runs — so
setting env vars alone is not enough; we must also flip jax_platforms
after import.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is compile-bound (wavefront programs
# re-jit per shape), so repeat runs skip straight to execution. The suite
# gets its OWN cache dir, separate from the TPU tools' .jax_cache: a
# full-suite run segfaulted deserializing an entry from the shared 8 GB
# cache (jax compilation_cache.get_executable_and_time), and a bad test
# cache must never be able to poison the TPU measurement pipeline.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache_cpu_tests"))
# 30s threshold: only the genuinely expensive programs (segmented bounce
# programs, band renders) are persisted. Cheap EAGER-dispatch while_loop
# executables must stay out of the cache: deserializing one written by
# the same process aborts in jaxlib (reproduced twice at
# compilation_cache.get_executable_and_time under the 8-device host
# platform; jit-compiled entries round-trip fine).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
assert jax.devices()[0].platform == "cpu"


def pytest_configure(config):
    # fast/slow tier split: `-m "not slow"` is the quick CI tier
    # (target < 5 min on one CPU core); the full suite includes the
    # CPU-minutes renders (segmented sponza, goldens, cross-validation)
    config.addinivalue_line(
        "markers", "slow: CPU-minutes test (excluded from the quick tier)")
