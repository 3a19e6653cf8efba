"""Test harness config: force CPU with 8 virtual devices.

Mirrors the reference's CPU-only test strategy (SURVEY.md section 4) while
adding what it lacks: multi-device mesh tests run against a virtual 8-device
CPU platform so sharding is validated without TPU hardware.
"""
import os

# Must run before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
# Some environments route XLA compilation through a remote service whose
# target machine differs from this host; CPU test compiles must stay local
# (a remote-compiled cache entry triggers cpu_aot machine-feature errors).
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_prng_impl", "threefry2x32")

# Persistent compilation cache: XLA-CPU compiles dominate test wall-time on
# this box; cache them across runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
