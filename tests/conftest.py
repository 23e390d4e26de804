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
assert jax.devices()[0].platform == "cpu"
