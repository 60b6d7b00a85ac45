"""Persistent XLA compilation cache (kill the per-process compile tax).

The reference pays no compile cost (MSBuild AOT for CUDA,
D3DX11CompileFromFile once per run, Shader.hpp:14-21); our jit programs
— especially the v5 traversal kernel — can cost minutes to compile on a
cold remote-TPU relay (BENCH_SCENES r3: 170 s for `traverse_select` vs
6–15 s steady-state; PERF.md round-2 post-mortem). JAX's persistent
compilation cache amortizes that to a disk read on every process after
the first: enable it before the first `jit` call from every entry point
(CLI, bench, tools).

The cache directory defaults to ``<repo>/.jax_cache`` and can be moved
with ``MCPT_COMPILE_CACHE`` (empty string disables).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)

_enabled = False


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Returns the cache directory in use, or None when disabled via
    ``MCPT_COMPILE_CACHE=""``. Safe to call from every entry point —
    only the first call configures anything.
    """
    global _enabled
    env = os.environ.get("MCPT_COMPILE_CACHE")
    if env is not None and env == "":
        return None
    path = cache_dir or env or _DEFAULT_DIR
    if _enabled:
        return path
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything — even sub-second programs; the bench/CLI
    # workloads re-run identical programs every process.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return path
