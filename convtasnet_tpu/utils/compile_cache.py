"""Persistent XLA compilation cache.

First compiles against the tunneled TPU are expensive (the full paper-config
train step is ~8-9 minutes through the remote compile service), and the
reference stack has nothing comparable — every PyTorch run re-pays its CUDA
warmup. JAX's persistent compilation cache turns every repeat compile
(same program + compiler flags) into a disk hit; measured through the axon
relay it drops a ~0.7 s toy compile to ~0.05 s, and repeat solver/bench
startups skip the multi-minute XLA builds entirely (the autotune probes
still *run* their timing races — only the compiles are cached).

Enabled by default for every CLI entry point. Controls:

- ``CONVTASNET_COMPILE_CACHE=<dir>``  — cache location
  (default ``~/.cache/convtasnet_tpu/xla``)
- ``CONVTASNET_COMPILE_CACHE=0``      — disable
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the persistent compile cache. Returns the cache
    directory, or None when disabled via ``CONVTASNET_COMPILE_CACHE=0``."""
    global _ENABLED
    env = os.environ.get("CONVTASNET_COMPILE_CACHE", "")
    if env == "0":
        return None
    if cache_dir is None:
        cache_dir = env or os.path.join(
            os.path.expanduser("~"), ".cache", "convtasnet_tpu", "xla")
    if _ENABLED:
        return cache_dir
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes noticeable compile time; the default
    # (1 s / 64 KB thresholds) already skips trivial programs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _ENABLED = True
    return cache_dir
