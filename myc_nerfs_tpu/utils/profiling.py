"""Profiling/tracing hooks (the reference has none — SURVEY.md §5.1).

- ``trace(dir)``: jax.profiler trace capture around a block (view in
  TensorBoard / xprof)
- ``Throughput``: rays/sec (or samples/sec) meter with host-sync timing —
  `jax.block_until_ready` does not reliably block on the axon platform, so
  the meter forces a tiny host read of the probe array
- ``checkify_nan``: wrap a function with jax.experimental.checkify NaN/Inf
  checks, replacing the reference's NaN asserts (barf-myc/model/base.py:
  125-126) and NaN-retry hack (model/nerf.py:248-249)
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace capture context."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """items/sec meter with forced host sync."""

    def __init__(self):
        self.items = 0
        self.t0 = None

    def start(self, probe=None):
        if probe is not None:
            _ = float(jax.numpy.asarray(probe).ravel()[0])
        self.t0 = time.perf_counter()
        self.items = 0

    def add(self, n: int):
        self.items += n

    def stop(self, probe) -> float:
        _ = float(jax.numpy.asarray(probe).ravel()[0])
        dt = time.perf_counter() - self.t0
        return self.items / dt if dt > 0 else 0.0


def checkify_nan(fn: Callable) -> Callable:
    """Wrap fn so NaN/Inf raise a checkify error with location info."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
