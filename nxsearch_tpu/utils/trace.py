"""Tracing / profiling hooks.

The reference has no tracing beyond the benchmark CLI's wall-clock
printer (src/utils/benchmark.c:44-70); SURVEY §5 calls for JAX
profiler hooks and per-phase timings in the rebuild.

- ``phase(name)``: near-zero-cost context manager; logs per-phase
  wall-clock at DEBUG level (enable with NXS_LOG_LEVEL=DEBUG).
- ``profiler_trace(logdir)``: wraps ``jax.profiler.trace`` so a block
  of searches can be captured for TensorBoard/XProf; enabled with
  NXS_PROFILE_DIR or explicitly.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

from .log import get_logger

_log = get_logger("trace")


@contextlib.contextmanager
def phase(name: str):
    """Time a phase; logs '<name>: N.NN ms' at DEBUG level."""
    if not _log.isEnabledFor(logging.DEBUG):
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _log.debug("%s: %.2f ms", name, (time.perf_counter() - t0) * 1e3)


@contextlib.contextmanager
def profiler_trace(logdir: str | None = None):
    """Capture a JAX profiler trace around the block.

    ``logdir`` defaults to $NXS_PROFILE_DIR; when neither is set the
    block runs untraced.
    """
    logdir = logdir or os.environ.get("NXS_PROFILE_DIR")
    if not logdir:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield
