"""Profiling harness (SURVEY.md §5: the reference has no tracing at all
— its only perf artifacts are wall-clock notes in MC.docx).

Two tools:

- :func:`trace` — context manager around ``jax.profiler.trace``; writes
  a TensorBoard-loadable trace (XLA op timeline, HBM usage) to a
  directory. Enabled from the CLI via ``--profile-dir`` and from
  ``bench.py`` via ``BENCH_PROFILE_DIR``.
- :func:`time_fn` — a `block_until_ready` micro-timing helper for
  per-kernel measurements (used by the tile sweeps and perf notes).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Profile the enclosed block into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def time_fn(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 1,
) -> float:
    """Median-free simple timing: seconds per call after warmup, with
    `block_until_ready` fencing (device-dispatch aware)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
