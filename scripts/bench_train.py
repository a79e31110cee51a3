"""Training-step and batch-scaling benchmark on the current backend.

Reports, at the paper config (4 s @ 8 kHz segments):
- train step ms at B=24 (the docs/RESULTS.md baseline geometry), XLA vs
  fused-Pallas forward (custom_vjp recompute backward), via a chained
  multi-step scan so the relay RTT is amortized;
- forward throughput at B=8 vs B=32 (per-element scaling — the round-1
  backlog flagged an apparent regression at larger batches);
- model FLOP utilization (MFU) against the v5e bf16 peak (197 TFLOP/s).

Usage: python scripts/bench_train.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12  # FLOP/s per chip


def _rtt(x, trials=5):
    from convtasnet_tpu.utils.timing import rtt_baseline

    return rtt_baseline(x, trials=trials)


def forward_flops(cfg, T):
    """FLOPs of one forward pass per batch element."""
    K = (T - cfg.kernel_size) // cfg.stride + 1
    N, B, H, P, C = (cfg.n_filters, cfg.bottleneck, cfg.hidden,
                     cfg.conv_kernel, cfg.num_speakers)
    f = 2 * K * cfg.kernel_size * N              # encoder matmul
    f += 2 * K * N * B                           # bottleneck
    if cfg.separator == "dpt":
        S = cfg.dpt_chunk
        n = -(-K // S)
        Kp = n * S
        per_path = (2 * Kp * B * 3 * B      # QKV
                    + 2 * Kp * B * B)       # out proj
        attn = 2 * Kp * S * B * 2 + 2 * Kp * n * B * 2  # scores+mix, both paths
        ffn = 2 * (2 * Kp * B * cfg.dpt_ff) * 2
        f += cfg.dpt_layers * (2 * per_path + attn + ffn)
    else:
        blocks = cfg.num_repeats * cfg.num_blocks
        f += blocks * (2 * K * B * H * 2 + 2 * K * H * P)  # 1x1s + dwconv
    f += 2 * K * B * (C * N)                     # mask head
    f += 2 * K * C * N * cfg.kernel_size + K * C * N   # decoder + mask apply
    return f


def bench_train_step(use_pallas: bool, batch=24, seconds=4.0, steps=8,
                     trials=3, batch_chunk=0, separator="tcn",
                     cfg_overrides=None):
    from convtasnet_tpu.config import ConvTasNetConfig, SolverConfig
    from convtasnet_tpu.train.train_step import (
        create_train_state,
        make_multi_train_step,
    )

    T = int(seconds * 8000)
    cfg = ConvTasNetConfig(compute_dtype="bfloat16", use_pallas=use_pallas,
                           separator=separator, **(cfg_overrides or {}))
    if use_pallas and jax.default_backend() != "cpu":
        from convtasnet_tpu.ops.pallas.tcn_block import ensure_probed_train

        # probes the forward registry AND races the fused fwd+bwd kernels
        # against XLA autodiff per dilation for the train-step shape
        # (the per-slice shape when gradient accumulation chunks the batch)
        ensure_probed_train(cfg, batch_chunk or batch, T, verbose=True)
    state, tx = create_train_state(cfg, SolverConfig(lr=1e-3),
                                   jax.random.PRNGKey(0), T)
    step = make_multi_train_step(cfg, tx, batch_chunk=batch_chunk)
    rng = np.random.default_rng(0)
    batch_data = (
        jnp.asarray(np.tile(rng.standard_normal((1, batch, T)), (steps, 1, 1)),
                    jnp.float32),
        jnp.full((steps, batch), T, jnp.int32),
        jnp.asarray(
            np.tile(rng.standard_normal((1, batch, 2, T)), (steps, 1, 1, 1)),
            jnp.float32),
        jnp.ones((steps, batch), jnp.float32),
    )
    rtt = _rtt(batch_data[1])
    state, m = step(state, batch_data)  # compile + warmup
    jax.device_get(m["loss"])
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        state, m = step(state, batch_data)
        jax.device_get(m["loss"])
        times.append(time.perf_counter() - t0)
    dt = (max(float(np.median(times)) - rtt, 1e-9)) / steps
    return dt, cfg, T


def bench_forward(batch, seconds=4.0, inner=10, trials=3, use_pallas=True,
                  separator="tcn", cfg_overrides=None):
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params

    T = int(seconds * 8000)
    cfg = ConvTasNetConfig(compute_dtype="bfloat16", use_pallas=use_pallas,
                           separator=separator, **(cfg_overrides or {}))
    if use_pallas and jax.default_backend() != "cpu":
        from convtasnet_tpu.ops.pallas.tcn_block import ensure_probed

        ensure_probed(cfg, batch, T)
    model = ConvTasNet(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    params = variables["params"]

    def chain(p, m):
        def body(carry, _):
            out = model.apply({"params": p}, carry)
            return jnp.sum(out, axis=1), jnp.float32(0)

        final, _ = jax.lax.scan(body, m, None, length=inner)
        return jnp.sum(final)

    fwd = jax.jit(chain)
    rng = np.random.default_rng(0)
    mixture = jnp.asarray(rng.standard_normal((batch, T)), jnp.float32)
    from convtasnet_tpu.utils.timing import median_fetch_seconds

    rtt = _rtt(mixture)
    dt = (max(median_fetch_seconds(fwd, params, mixture, trials=trials)
              - rtt, 1e-9)) / inner
    return dt, cfg, T


def main():
    print(f"# backend={jax.default_backend()}")
    # --- train step, both forwards -------------------------------------
    for use_pallas in (False, True):
        dt, cfg, T = bench_train_step(use_pallas)
        fwd_f = forward_flops(cfg, T) * 24
        train_f = 3 * fwd_f  # fwd + ~2x fwd for the backward
        mfu = train_f / dt / V5E_BF16_PEAK
        rt = 24 * 4.0 / dt
        print(f"train step B=24x4s pallas={int(use_pallas)}: "
              f"{dt * 1e3:.1f} ms  ({rt:.0f}x realtime, MFU~{mfu:.1%})",
              flush=True)
    # --- forward batch scaling ------------------------------------------
    for batch in (8, 32):
        for use_pallas in (False, True):
            dt, cfg, T = bench_forward(batch, use_pallas=use_pallas)
            f = forward_flops(cfg, T) * batch
            mfu = f / dt / V5E_BF16_PEAK
            rt = batch * 4.0 / dt
            print(f"forward B={batch} pallas={int(use_pallas)}: "
                  f"{dt * 1e3:.2f} ms  ({rt:.0f}x realtime, "
                  f"{dt / batch * 1e3:.3f} ms/elem, MFU~{mfu:.1%})",
                  flush=True)


def main_dpt():
    """Forward throughput of the dual-path family: plain XLA einsums vs
    the probe-gated fused sublayer kernels (inter attention + FFN)."""
    print(f"# backend={jax.default_backend()} separator=dpt")
    for batch in (8, 32):
        for use_pallas in (False, True):
            dt, cfg, T = bench_forward(batch, use_pallas=use_pallas,
                                       separator="dpt")
            f = forward_flops(cfg, T) * batch
            mfu = f / dt / V5E_BF16_PEAK
            rt = batch * 4.0 / dt
            print(f"forward B={batch} dpt pallas={int(use_pallas)}: "
                  f"{dt * 1e3:.2f} ms  ({rt:.0f}x realtime, "
                  f"{dt / batch * 1e3:.3f} ms/elem, MFU~{mfu:.1%})",
                  flush=True)


def main_dpt_train():
    """DPT train step: XLA autodiff vs the probe-gated fused pair (Pallas
    inter-attention forward + fused single-kernel backward). Smaller B than
    the TCN's 24: the attention's O(n^2) scores grow the backward."""
    import sys as _sys

    batch = 16
    if "--batch" in _sys.argv:
        batch = int(_sys.argv[_sys.argv.index("--batch") + 1])
    print(f"# backend={jax.default_backend()} separator=dpt train B={batch}")
    for use_pallas in (False, True):
        dt, cfg, T = bench_train_step(use_pallas, batch=batch,
                                      separator="dpt")
        train_f = 3 * forward_flops(cfg, T) * batch
        mfu = train_f / dt / V5E_BF16_PEAK
        print(f"train step B={batch}x4s dpt pallas={int(use_pallas)}: "
              f"{dt * 1e3:.1f} ms  ({batch * 4.0 / dt:.0f}x realtime, "
              f"MFU~{mfu:.1%})", flush=True)


def main_chunked():
    """Does the VMEM-residency bonus (docs/RESULTS.md "Batch scaling")
    carry to training? Gradient accumulation over 8-row slices inside the
    step vs the full-batch step, both forwards."""
    print(f"# backend={jax.default_backend()} train batch_chunk sweep")
    for use_pallas in (False, True):
        for chunk in (0, 8):
            dt, cfg, T = bench_train_step(use_pallas, batch_chunk=chunk)
            train_f = 3 * forward_flops(cfg, T) * 24
            mfu = train_f / dt / V5E_BF16_PEAK
            print(f"train step B=24x4s pallas={int(use_pallas)} "
                  f"chunk={chunk}: {dt * 1e3:.1f} ms  "
                  f"({24 * 4.0 / dt:.0f}x realtime, MFU~{mfu:.1%})",
                  flush=True)


if __name__ == "__main__":
    from convtasnet_tpu.ops.pallas import probe_budget

    # measurement scripts want the FULL race, not the bench/driver's
    # deadline-capped subset (explicit env still wins)
    if not os.environ.get("CONVTASNET_PROBE_BUDGET", "").strip():
        probe_budget.begin(0)
    import sys

    from convtasnet_tpu.utils.compile_cache import enable_compile_cache

    # CLI-only (ADVICE r4): importing this module must not create cache
    # dirs or mutate global jax config as a side effect
    enable_compile_cache()

    if "--separator" in sys.argv and "dpt" in sys.argv:
        if "--train" in sys.argv:
            main_dpt_train()
        else:
            main_dpt()
    elif "--chunked" in sys.argv:
        main_chunked()
    else:
        main()
