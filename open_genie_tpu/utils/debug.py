"""Tracing / profiling / NaN-debug utilities.

The reference has no profiler hooks at all (SURVEY.md section 5). Here:
  * `profile_trace`: context manager around `jax.profiler` for TensorBoard
    traces of jitted steps.
  * `step_timer`: lightweight wall-clock timer with device sync.
  * `enable_nan_debug`: flips `jax_debug_nans` (single-controller JAX has no
    data races to sanitize; NaN-propagation is the failure mode worth a
    flag).
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "logs/profile") -> Iterator[None]:
    """Capture a `jax.profiler` trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(sync_on=None) -> Iterator[dict]:
    """Time a block; `sync_on` (an array / pytree) is block_until_ready'd
    before the stop timestamp so async dispatch doesn't lie."""
    out = {}
    t0 = time.perf_counter()
    yield out
    if sync_on is not None:
        jax.block_until_ready(sync_on)
    out["seconds"] = time.perf_counter() - t0


def enable_nan_debug(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
