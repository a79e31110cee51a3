"""Relay-safe on-device timing.

The real TPU in this environment is reached through a relay with ~30 ms
round-trip latency, and ``block_until_ready()`` does NOT actually block
through it — every timing in the repo must (a) force completion with
``jax.device_get``, (b) subtract a trivial-op RTT baseline, and (c)
integrate enough work per fetch that run-to-run RTT jitter (several ms)
doesn't swamp the signal. This module is the single implementation of that
protocol; bench.py, the autotune probes (``ops/pallas/tcn_block``) and the
scripts/ benchmarks all use it, so a fix to the protocol lands everywhere.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

__all__ = ["rtt_baseline", "median_fetch_seconds", "time_chained"]


def rtt_baseline(x, trials: int = 5) -> float:
    """Median seconds for a trivial jitted op on ``x`` fetched via
    ``device_get`` — the host<->device round-trip floor to subtract."""
    triv = jax.jit(jnp.sum)
    jax.device_get(triv(x))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.device_get(triv(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def median_fetch_seconds(f, *args, trials: int = 5) -> float:
    """Median wall seconds of ``jax.device_get(f(*args))`` after one warmup
    call (compile + cache). No RTT subtraction — combine with
    ``rtt_baseline`` when the per-call work is small."""
    jax.device_get(f(*args))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.device_get(f(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def time_chained(fn, x, inner: int = 150, trials: int = 5,
                 min_work_s: float = 0.02) -> float:
    """Median per-iteration seconds of ``fn`` chained ``inner`` times in one
    jitted ``lax.scan`` (output fed back as input so iterations serialize),
    RTT-subtracted.

    ``fn`` must map a value of ``x``'s shape/dtype to the same shape/dtype.

    The chained work must dwarf the relay's RTT jitter or the subtraction
    returns noise — observed with tiny model configs, where per-call cost is
    a few µs and every autotune candidate "measures" ~0. So if the chain
    measures under ``min_work_s``, it is re-chained with a proportionally
    larger ``inner`` and measured again (one recompile of the same cached
    kernel).
    """

    def timed_chain(n):
        def chain(x0):
            def body(carry, _):
                return fn(carry), jnp.float32(0)

            final, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.sum(final)

        return median_fetch_seconds(jax.jit(chain), x, trials=trials)

    rtt = rtt_baseline(x, trials=trials)
    t = timed_chain(inner)
    if t - rtt < min_work_s:
        scale = min_work_s / max(t - rtt, 1e-4)
        inner = min(int(inner * max(scale, 2.0)), 50_000)
        t = timed_chain(inner)
    return max(t - rtt, 1e-9) / inner
