"""In-model validation of the fused two-block TCN PAIR winners (forward).

``probe_fused_block_pairs`` races each eligible (2**x, 2**(x+1)) pair
kernel against the chained single-block winners in isolation. Measured on
the real chip (round 4): at the flagship [8, 4 s] shape the isolated race
engaged two pairs — (4,8) at 0.314 vs 0.347 ms and (16,32) at 0.210 vs
0.364 ms — yet the FULL forward regressed ~5% (6,077→5,790× realtime).
A Pallas custom call is a fusion barrier: widening it from one block to
two changes what XLA fuses and keeps VMEM-resident around it, a cost the
isolated race cannot see (the same mechanism round 3 measured for the
dual-path sublayers, ``dpt_inmodel``). So pair engagement is re-decided
inside the full jitted separator stack: greedily try demoting each
engaged pair back to its chained single-block winners and promoting each
isolated-race loser to its fastest numerics-verified pair variant, with
the margin + median-of-3 discipline from ``inmodel_core``.

Decisions persist to the shared autotune disk cache under
``tcn:inmodel-pair:`` keys, keyed against the raced winners so a re-raced
pair re-validates. ``CONVTASNET_INMODEL_RACE=0`` disables (same switch as
the other validators; tests set it).

Reference parity: the reference (src/conv_tasnet.py) has one fixed torch
graph and nothing to validate; this is TPU-specific autotune discipline.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from convtasnet_tpu.ops.pallas.inmodel_core import (
    apply_cached_decision,
    greedy_validate,
)

# (batch, K, B, H, P, X, norm, causal, dtype-str) validated this process
_INMODEL_DONE: set = set()


def _log(verbose: bool, msg: str) -> None:
    if verbose:
        import sys as _sys

        print(msg, file=_sys.stderr)


def validate_pairs_in_model(cfg, batch: int, T: int,
                            verbose: bool = True) -> None:
    """Greedy in-model re-validation of the fused pair winners for one
    concrete ``[batch, T]`` forward shape (idempotent; no-op on CPU, for
    non-TCN separators, when pair fusion is disabled, or when
    ``CONVTASNET_INMODEL_RACE=0``)."""
    from convtasnet_tpu.ops.pallas.tcn_block_pair import _pair_enabled

    if (not cfg.use_pallas or jax.default_backend() == "cpu"
            or getattr(cfg, "separator", "tcn") != "tcn"
            or not _pair_enabled()
            or cfg.norm_type not in ("gLN", "cLN")
            or os.environ.get("CONVTASNET_INMODEL_RACE", "1") == "0"):
        return
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _autotune_cache_load,
        _autotune_cache_store,
    )
    from convtasnet_tpu.ops.pallas.tcn_block_pair import (
        _FUSED_PAIR_READY,
        _PAIR_BEST_FUSED,
    )

    K = (T - cfg.kernel_size) // cfg.stride + 1
    memo_key = (batch, K, cfg.bottleneck, cfg.hidden, cfg.conv_kernel,
                cfg.num_blocks, cfg.norm_type, cfg.causal,
                str(jnp.dtype(cfg.compute_dtype)))
    if memo_key in _INMODEL_DONE:
        return
    pairs = [(2 ** i, 2 ** (i + 1))
             for i in range(0, cfg.num_blocks - 1, 2)]
    if not pairs:
        return
    regs = {f"p{d1}-{d2}": (_FUSED_PAIR_READY,
                            (d1, d2, cfg.norm_type, cfg.causal))
            for d1, d2 in pairs}
    best_fused = {f"p{d1}-{d2}": _PAIR_BEST_FUSED.get(
        (d1, d2, cfg.norm_type, cfg.causal)) for d1, d2 in pairs}
    disk_key = "tcn:inmodel-pair:" + ":".join(str(v) for v in memo_key)
    cached = _autotune_cache_load().get(disk_key)
    if cached and apply_cached_decision(regs, cached):
        _INMODEL_DONE.add(memo_key)
        _log(verbose, f"tcn pair inmodel: decision loaded from disk "
                      f"({disk_key})")
        return
    engaged = {nm for nm, (reg, key) in regs.items()
               if reg.get(key) is not None}
    promotable = {nm for nm in regs
                  if nm not in engaged and best_fused.get(nm) is not None}
    if not engaged and not promotable:
        _INMODEL_DONE.add(memo_key)
        return

    from convtasnet_tpu.ops.pallas import probe_budget

    if probe_budget.exhausted():
        # probe wall-clock budget exhausted: keep the raced winners
        # as-is for this run; NOT memoized, so a fresh budget
        # (next entry-point call / process) re-validates
        _log(verbose, "tcn pair inmodel: probe budget exhausted -> "
                      "keeping raced winners (unvalidated)")
        return

    time_fn = _separator_timer(cfg, batch, T, verbose)
    if time_fn is None:  # timing infrastructure failed: keep raced winners
        _INMODEL_DONE.add(memo_key)
        return

    names = list(regs)
    decision = greedy_validate(
        regs, best_fused, time_fn,
        demote_order=names,
        promote_order=names,
        log=lambda msg: _log(verbose, f"tcn pair inmodel B={batch}: {msg}"),
    )
    if decision:
        _autotune_cache_store(disk_key, decision)
    _INMODEL_DONE.add(memo_key)


def _separator_timer(cfg, batch: int, T: int,
                     verbose: bool) -> Optional[callable]:
    """Chained, RTT-compensated timer over the full TCN separator stack
    (the pairs' real fusion environment; the encoder/decoder around it
    don't fuse into the block chain). Returns None if the model can't be
    built."""
    try:
        from convtasnet_tpu.models.conv_tasnet import TemporalConvNet
        from convtasnet_tpu.utils.timing import (
            median_fetch_seconds,
            rtt_baseline,
        )
    except Exception:  # noqa: BLE001 — circular-import or missing dep
        return None

    K = (T - cfg.kernel_size) // cfg.stride + 1
    N = cfg.n_filters
    # on-device probe input (host->device = one PRNG key; relay bandwidth)
    from convtasnet_tpu.ops.pallas.tcn_block import _probe_inputs

    (w,) = _probe_inputs([((batch, K, N), 1.0)],
                         jnp.dtype(cfg.compute_dtype))
    mod = TemporalConvNet(cfg)
    try:
        variables = mod.init(jax.random.PRNGKey(0), w, train=False)
    except Exception:  # noqa: BLE001
        return None

    inner = 10
    rtt = rtt_baseline(w, trials=5)

    def measure() -> float:
        # Registry state is read at TRACE time and jax.jit keys its trace
        # cache on the function object — a FRESH closure per measurement or
        # the toggle is silently ignored (see dpt_inmodel's stale-trace
        # note).
        def chain(vs, x):
            def body(carry, _):
                masks = mod.apply(vs, carry, train=False)
                return (jnp.sum(masks, axis=2).astype(carry.dtype),
                        jnp.float32(0))

            final, _ = jax.lax.scan(body, x, None, length=inner)
            return jnp.sum(final.astype(jnp.float32))

        dt = median_fetch_seconds(jax.jit(chain), variables, w,
                                  trials=5) - rtt
        return max(dt, 1e-9) / inner

    return measure
