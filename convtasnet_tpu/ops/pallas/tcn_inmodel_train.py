"""In-model validation of the fused TCN TRAIN winners (forward+backward
custom-VJP pairs).

``probe_fused_block_train`` races each dilation's fused fwd+bwd pair
against XLA autodiff in isolation. Round-3 measurements proved isolated
races mispredict full-model cost in both directions for the forward
sublayers (a Pallas custom call is a fusion barrier whose cost depends on
what XLA would have fused around it); the train-side winners were trusted
on exactly that oracle class. A full-train-step timing per toggle costs an
~8-9 min compile through the relay, so this validator re-decides each
dilation's winner on a **reduced-repeat separator stack under grad**
(``num_repeats=1``, identical [batch, K, B, H] shapes and block kernels):
it shares every per-block kernel and boundary with the real step, compiles
in seconds warm, and the greedy margin + median-of-3 discipline
(``inmodel_core``) guards borderline flips instead of a full-step
escalation.

The timer differentiates with respect to the input AND all parameters —
grad-wrt-input alone would let XLA dead-code-eliminate the parameter
cotangent computation in the autodiff variant and bias the race (the fused
backward kernel always computes all ten cotangents).

Decisions persist to the shared autotune disk cache under
``tcn:inmodel-train:`` keys, keyed against the raced winners so a re-raced
dilation re-validates. ``CONVTASNET_INMODEL_RACE=0`` disables (same switch
as the DPT forward validator; tests set it).

Reference parity: the reference (src/conv_tasnet.py) has one fixed torch
graph and nothing to validate; this is TPU-specific autotune discipline.
"""

from __future__ import annotations

import dataclasses
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


def validate_train_in_model(cfg, batch: int, T: int,
                            verbose: bool = True) -> None:
    """Greedy in-model re-validation of the fused train-pair winners for
    one concrete ``[batch, T]`` train-slice shape (idempotent; no-op on
    CPU, for non-TCN separators, or when ``CONVTASNET_INMODEL_RACE=0``)."""
    if (not cfg.use_pallas or jax.default_backend() == "cpu"
            or getattr(cfg, "separator", "tcn") != "tcn"
            or cfg.norm_type not in ("gLN", "cLN")
            or os.environ.get("CONVTASNET_INMODEL_RACE", "1") == "0"):
        return
    from convtasnet_tpu.ops.pallas.tcn_block import (
        _autotune_cache_load,
        _autotune_cache_store,
        _BWD_BEST_FUSED,
        _FUSED_BWD_READY,
    )

    K = (T - cfg.kernel_size) // cfg.stride + 1
    memo_key = (batch, K, cfg.bottleneck, cfg.hidden, cfg.conv_kernel,
                cfg.num_blocks, cfg.norm_type, cfg.causal,
                str(jnp.dtype(cfg.compute_dtype)))
    if memo_key in _INMODEL_DONE:
        return
    dilations = [2 ** i for i in range(cfg.num_blocks)]
    regs = {f"d{d}": (_FUSED_BWD_READY, (d, cfg.norm_type, cfg.causal))
            for d in dilations}
    best_fused = {f"d{d}": _BWD_BEST_FUSED.get((d, cfg.norm_type, cfg.causal))
                  for d in dilations}
    # Two-block pair train custom-VJPs (gLN): validated in the same greedy
    # pass, pairs FIRST — an engaged pair bypasses its two singles in the
    # model, so the pair decision must settle before the single toggles
    # mean anything.
    pair_names = []
    if cfg.norm_type == "gLN":
        from convtasnet_tpu.ops.pallas.tcn_block_pair import (
            _PAIR_TRAIN_BEST_FUSED,
            _PAIR_TRAIN_READY,
            _pair_enabled,
        )

        if _pair_enabled():
            for i in range(0, cfg.num_blocks - 1, 2):
                d1, d2 = 2 ** i, 2 ** (i + 1)
                nm = f"p{d1}-{d2}"
                pkey = (d1, d2, cfg.norm_type, cfg.causal)
                regs[nm] = (_PAIR_TRAIN_READY, pkey)
                best_fused[nm] = _PAIR_TRAIN_BEST_FUSED.get(pkey)
                pair_names.append(nm)
    disk_key = "tcn:inmodel-train:" + ":".join(str(v) for v in memo_key)
    cached = _autotune_cache_load().get(disk_key)
    if cached and apply_cached_decision(regs, cached):
        _INMODEL_DONE.add(memo_key)
        _log(verbose, f"tcn train inmodel: decision loaded from disk "
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
        _log(verbose, "tcn train inmodel: probe budget exhausted -> "
                      "keeping raced winners (unvalidated)")
        return

    time_fn = _r1_grad_timer(cfg, batch, T, verbose)
    if time_fn is None:  # timing infrastructure failed: keep raced winners
        _INMODEL_DONE.add(memo_key)
        return

    names = pair_names + [f"d{d}" for d in dilations]
    decision = greedy_validate(
        regs, best_fused, time_fn,
        demote_order=names,
        promote_order=names,
        log=lambda msg: _log(verbose, f"tcn train inmodel B={batch}: {msg}"),
    )
    if decision:
        _autotune_cache_store(disk_key, decision)
    _INMODEL_DONE.add(memo_key)


def _r1_grad_timer(cfg, batch: int, T: int,
                   verbose: bool) -> Optional[callable]:
    """Chained, RTT-compensated timer over grad of a ``num_repeats=1``
    separator stack — every per-block fused kernel and block boundary of
    the real train step at a quarter of the compile cost. Returns None if
    the model can't be built."""
    try:
        from convtasnet_tpu.models.conv_tasnet import TemporalConvNet
        from convtasnet_tpu.utils.timing import (
            median_fetch_seconds,
            rtt_baseline,
        )
    except Exception:  # noqa: BLE001 — circular-import or missing dep
        return None

    cfg1 = dataclasses.replace(cfg, num_repeats=1)
    K = (T - cfg.kernel_size) // cfg.stride + 1
    N = cfg.n_filters
    # on-device probe input (host->device = one PRNG key; relay bandwidth)
    from convtasnet_tpu.ops.pallas.tcn_block import _probe_inputs

    (w,) = _probe_inputs([((batch, K, N), 1.0)],
                         jnp.dtype(cfg.compute_dtype))
    mod = TemporalConvNet(cfg1)
    try:
        variables = mod.init(jax.random.PRNGKey(0), w, train=True)
    except Exception:  # noqa: BLE001
        return None

    inner = 8
    rtt = rtt_baseline(w, trials=5)

    def measure() -> float:
        # Registry state is read at TRACE time and jax.jit keys its trace
        # cache on the function object — a FRESH closure per measurement or
        # the toggle is silently ignored (see dpt_inmodel's stale-trace
        # note).
        def chain(vs, x0):
            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p), vs["params"])

            def body(carry, _):
                x, acc = carry

                def loss(p, xx):
                    masks = mod.apply({"params": p}, xx, train=True)
                    return jnp.sum(jnp.square(masks.astype(jnp.float32)))

                gp, gx = jax.grad(loss, argnums=(0, 1))(vs["params"], x)
                acc = jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(a.dtype), acc, gp)
                return (gx.astype(x0.dtype), acc), jnp.float32(0)

            (xf, accf), _ = jax.lax.scan(
                body, (x0, zeros), None, length=inner)
            total = jnp.sum(xf.astype(jnp.float32))
            leaves = jax.tree_util.tree_leaves(accf)
            return total + sum(jnp.sum(g.astype(jnp.float32))
                               for g in leaves)

        dt = median_fetch_seconds(jax.jit(chain), variables, w,
                                  trials=5) - rtt
        return max(dt, 1e-9) / inner

    return measure
