"""Tracing / profiling utilities (SURVEY §5: tracing row).

The reference's only performance instrumentation is the wall-clock RTF inside
``enhance(timeit=True)`` (reference model.py:433, 460-463) plus tqdm bars.
TPU-native equivalents:

- ``rtf_harness``: steady-state RTF measurement with ``block_until_ready``
  brackets and compile excluded (the reference's number silently includes
  one-time CUDA warmup; here warmup is explicit).
- ``trace``: context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory.
- ``debug_nans``: toggle ``jax_debug_nans`` (the single-controller JAX
  equivalent of a NaN-watchdog; SURVEY §5 race-detection row).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


def rtf_harness(enhance_fn: Callable[[], "jax.Array"], audio_seconds: float,
                warmup: int = 1, reps: int = 3) -> Dict[str, float]:
    """Measure steady-state RTF of a zero-arg enhancement thunk.

    Returns {"rtf": wall/audio (lower better), "inv_rtf": audio/wall,
    "wall_s": mean wall seconds}. The thunk must return a device array;
    synchronization is handled here.
    """
    for _ in range(warmup):
        jax.block_until_ready(enhance_fn())
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(enhance_fn())
    wall = (time.time() - t0) / reps
    return {"rtf": wall / audio_seconds, "inv_rtf": audio_seconds / wall,
            "wall_s": wall}


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block: ``with trace('/tmp/jax-trace'): step()``.

    View with TensorBoard's profile plugin. On backends without device
    tracing support this still records host-side activity.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Temporarily enable jax_debug_nans (re-runs the op that produced a NaN
    un-jitted and raises with its location)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
