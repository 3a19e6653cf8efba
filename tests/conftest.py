"""Test harness config: force CPU with 8 virtual devices.

Mirrors the reference's CPU-only test strategy (SURVEY.md section 4) while
adding what it lacks: multi-device mesh tests run against a virtual 8-device
CPU platform so sharding is validated without TPU hardware.
"""
import os

# Must run before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_prng_impl", "threefry2x32")
