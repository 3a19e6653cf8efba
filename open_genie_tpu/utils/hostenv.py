"""Guaranteed-local CPU environment for jax subprocesses.

This machine attaches a remote-TPU PJRT plugin to EVERY python process via
a sitecustomize on PYTHONPATH plus a global `JAX_PLATFORMS` override; any
"CPU" child that inherits the environment silently serializes against the
TPU tunnel and hangs. This is the single source of truth for scrubbing it
-- used by `__graft_entry__.dryrun_multichip`, `tools/parity_check.py`,
and the multi-process tests. Grow the strip-list HERE, nowhere else.
"""
from __future__ import annotations

import os
import re
from typing import Optional

# Env prefixes owned by remote-TPU plugins / TPU runtimes.
_TPU_ENV_PREFIXES = ("PALLAS_AXON", "AXON_", "TPU_", "LIBTPU")


def scrubbed_cpu_env(
    n_devices: Optional[int] = None,
    repo_root: Optional[str] = None,
    base: Optional[dict] = None,
) -> dict:
    """Environment dict for a subprocess that MUST run local XLA-CPU.

    Strips remote-TPU sitecustomize dirs from PYTHONPATH and every TPU
    env knob, forces `JAX_PLATFORMS=cpu`, optionally pins the virtual
    device count, and points the child at the repo's persistent compile
    cache so repeat runs are fast.
    """
    env = dict(os.environ if base is None else base)
    parts = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p.lower()
    ]
    if repo_root is None:
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    env["PYTHONPATH"] = os.pathsep.join([repo_root] + parts)
    for k in list(env):
        if k.startswith(_TPU_ENV_PREFIXES):
            env.pop(k)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "",
        env.get("XLA_FLAGS", ""),
    ).strip()
    if n_devices is not None:
        flags = (flags + f" --xla_force_host_platform_device_count={n_devices}").strip()
    # XLA-CPU collectives default to a 40s rendezvous *termination* timeout
    # (the process aborts). With n virtual devices time-slicing ONE physical
    # core, device threads between collectives get scheduled tens of seconds
    # apart on large programs (the flagship dryrun's 2^18-vocab head), so a
    # straggler crossing 40s kills the run. These are liveness watchdogs,
    # not correctness bounds -- give them headroom.
    for flag in (
        "--xla_cpu_collective_call_warn_stuck_timeout_seconds=120",
        "--xla_cpu_collective_call_terminate_timeout_seconds=600",
    ):
        if flag.split("=")[0] not in flags:
            flags = (flags + " " + flag).strip()
    env["XLA_FLAGS"] = flags
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        repo_root, "tests", ".jax_cache"
    )
    return env
