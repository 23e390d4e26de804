"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a fake 8-device mesh
(``xla_force_host_platform_device_count``) so CI needs no real TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
