"""Decompose the TCN train step's time on-chip: forward+loss vs grad vs
full optimizer step.

The fused per-block fwd+bwd kernels account for most of the measured
~77 ms at B=24 x 4 s; this isolates the rest (uPIT loss, encoder/decoder
backward, global-norm clip + Adam + donation) so optimization effort goes
where the milliseconds are. Reference scope: the reference's hot loop is
the equivalent torch step (src/solver.py:181-198); it never measured a
breakdown.

Usage: python scripts/bench_step_anatomy.py [--batch 24] [--use-pallas 1]

Each phase is timed as an 8-iteration scan chained inside one jitted
program (same integration discipline as bench_train.py), RTT-compensated.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _rtt(x):
    f = jax.jit(lambda v: v[..., 0] + 1.0)
    jax.device_get(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--use-pallas", type=int, default=1)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--trials", type=int, default=5)
    a = ap.parse_args()

    from convtasnet_tpu.config import ConvTasNetConfig, SolverConfig
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet
    from convtasnet_tpu.train.train_step import (
        _weighted_loss,
        create_train_state,
        make_multi_train_step,
    )
    from convtasnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    T = int(a.seconds * 8000)
    B = a.batch
    cfg = ConvTasNetConfig(compute_dtype="bfloat16",
                           use_pallas=bool(a.use_pallas))
    if a.use_pallas and jax.default_backend() != "cpu":
        from convtasnet_tpu.ops.pallas.tcn_block import ensure_probed_train

        ensure_probed_train(cfg, B, T, verbose=True)

    model = ConvTasNet(cfg)
    state, tx = create_train_state(cfg, SolverConfig(lr=1e-3),
                                   jax.random.PRNGKey(0), T)
    rng = np.random.default_rng(0)
    mixture = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)
    sources = jnp.asarray(rng.standard_normal((B, 2, T)), jnp.float32)
    weights = jnp.ones((B,), jnp.float32)
    batch = (mixture, lengths, sources, weights)
    params = state.params
    bstats = state.batch_stats

    n = a.steps

    def chain(body, init):
        def scan_body(carry, _):
            return body(carry), jnp.float32(0)

        out, _ = jax.lax.scan(scan_body, init, None, length=n)
        return out

    # 1. forward + uPIT loss (no grad). Carry the loss back into the input
    # so XLA cannot overlap iterations.
    def loss_once(mx):
        loss, _ = _weighted_loss(model, params, bstats,
                                 (mx, lengths, sources, weights), train=True)
        return mx + loss.astype(mx.dtype) * 1e-9

    f_loss = jax.jit(lambda mx: jnp.sum(chain(loss_once, mx)))

    # 2. loss + backward (no optimizer). Fold a grad-norm scalar back in.
    def grad_once(mx):
        def lf(p):
            loss, _ = _weighted_loss(model, p, bstats,
                                     (mx, lengths, sources, weights),
                                     train=True)
            return loss

        loss, grads = jax.value_and_grad(lf)(params)
        gsum = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads))
        return mx + (loss + gsum).astype(mx.dtype) * 1e-12

    f_grad = jax.jit(lambda mx: jnp.sum(chain(grad_once, mx)))

    # 3. full step (grad + clip + Adam + donation), the production path.
    step = make_multi_train_step(cfg, tx)
    steps_batch = (
        jnp.broadcast_to(mixture, (n,) + mixture.shape),
        jnp.broadcast_to(lengths, (n,) + lengths.shape),
        jnp.broadcast_to(sources, (n,) + sources.shape),
        jnp.broadcast_to(weights, (n,) + weights.shape),
    )

    rtt = _rtt(mixture)
    print(f"# backend={jax.default_backend()} B={B} T={T} "
          f"pallas={a.use_pallas} steps={n} rtt={rtt * 1e3:.1f}ms",
          flush=True)

    def timed(label, fn, *args):
        jax.device_get(fn(*args))  # compile + warm
        ts = []
        for _ in range(a.trials):
            t0 = time.perf_counter()
            jax.device_get(fn(*args))
            ts.append(time.perf_counter() - t0)
        dt = (max(float(np.median(ts)) - rtt, 1e-9)) / n
        print(f"{label}: {dt * 1e3:.2f} ms/iter", flush=True)
        return dt

    t_loss = timed("fwd+loss          ", f_loss, mixture)
    t_grad = timed("fwd+loss+backward ", f_grad, mixture)

    st, m = step(state, steps_batch)  # warm (donation: fresh state after)
    jax.device_get(m["loss"])
    ts = []
    for _ in range(a.trials):
        t0 = time.perf_counter()
        st, m = step(st, steps_batch)
        jax.device_get(m["loss"])
        ts.append(time.perf_counter() - t0)
    t_step = (max(float(np.median(ts)) - rtt, 1e-9)) / n
    print(f"full train step   : {t_step * 1e3:.2f} ms/iter", flush=True)

    print(f"-> backward      : {(t_grad - t_loss) * 1e3:.2f} ms "
          f"({(t_grad - t_loss) / t_grad:.0%} of grad)", flush=True)
    print(f"-> optimizer tail: {(t_step - t_grad) * 1e3:.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    from convtasnet_tpu.ops.pallas import probe_budget

    # measurement scripts want the FULL race, not the bench/driver's
    # deadline-capped subset (explicit env still wins)
    if not os.environ.get("CONVTASNET_PROBE_BUDGET", "").strip():
        probe_budget.begin(0)
    sys.exit(main())
