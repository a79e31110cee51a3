"""Re-decide the TCN forward winner set with bench-grade timing.

The per-dilation probe races and the in-model pair validator integrate
~5 ms of device work per reading (inner=10 separator chains) against a
~30 ms relay RTT; on a degraded relay (round 5: probe compiles queued for
minutes, RTT jitter way above the usual few ms) that noise can pick a
winner set measurably worse than round 4's (bench 5,803x vs 6,535x with
identical kernel sources). This script re-ranks ALTERNATIVE registry
configurations — as-probed, pair(1,2) forced on, uniform single-block
variant sets, @800-tile strips — under the bench protocol itself
(INNER-forward chained scans, ~160 ms device work per fetch, median of
many trials), then persists the best set to the shared autotune disk
cache (per-dilation ``fwd:`` entry + ``tcn:inmodel-pair:`` decision) so
every later entry point (bench.py, the driver) loads it.

Usage: python scripts/tune_fwd_winners.py [--batch 8] [--trials 7]
       [--inner 30] [--apply 1]

Prints one line per configuration (ms/forward + derived x-realtime) and
what was persisted. Timing-only: every candidate variant already passed
the probe's on-device numerics gate (winners are only drawn from the
gated variant namespace).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--inner", type=int, default=30)
    ap.add_argument("--trials", type=int, default=7)
    ap.add_argument("--apply", type=int, default=1,
                    help="persist the winning set to the autotune cache")
    a = ap.parse_args()

    from convtasnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params
    from convtasnet_tpu.ops.pallas import probe_budget
    from convtasnet_tpu.ops.pallas import tcn_block as tb
    from convtasnet_tpu.ops.pallas import tcn_block_pair as tbp
    from convtasnet_tpu.utils.timing import median_fetch_seconds, rtt_baseline

    if not os.environ.get("CONVTASNET_PROBE_BUDGET", "").strip():
        probe_budget.begin(0)  # measurement script: no deadline

    cfg = ConvTasNetConfig(compute_dtype="bfloat16",
                           use_pallas=jax.default_backend() != "cpu")
    T = int(a.seconds * 8000)
    B = a.batch
    K = (T - cfg.kernel_size) // cfg.stride + 1
    dils = [2 ** i for i in range(cfg.num_blocks)]
    pairs = [(2 ** i, 2 ** (i + 1))
             for i in range(0, cfg.num_blocks - 1, 2)]

    tb.ensure_probed(cfg, B, T, verbose=True)

    skey = lambda d: (d, cfg.norm_type, cfg.causal)  # noqa: E731
    pkey = lambda p: (p[0], p[1], cfg.norm_type, cfg.causal)  # noqa: E731
    as_probed_singles = {d: tb._FUSED_READY.get(skey(d)) for d in dils}
    as_probed_pairs = {p: tbp._FUSED_PAIR_READY.get(pkey(p)) for p in pairs}
    print(f"as-probed singles: {as_probed_singles}", file=sys.stderr)
    print(f"as-probed pairs:   {as_probed_pairs}", file=sys.stderr)

    model = ConvTasNet(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    params = variables["params"]
    mixture = jax.jit(
        lambda k: jax.random.normal(k, (B, T), jnp.float32)
    )(jax.random.PRNGKey(0))
    rtt = rtt_baseline(mixture, trials=5)

    def set_state(singles: dict, pair_cfg: dict) -> None:
        for d in dils:
            tb._FUSED_READY[skey(d)] = singles.get(d)
        for p in pairs:
            tbp._FUSED_PAIR_READY[pkey(p)] = pair_cfg.get(p)

    def measure() -> float:
        # fresh closure per registry state: jit keys its trace cache on
        # the function object (registry is read at trace time)
        def chain(p, m):
            def body(carry, _):
                out = model.apply({"params": p}, carry)
                return jnp.sum(out, axis=1), jnp.float32(0)

            final, _ = jax.lax.scan(body, m, None, length=a.inner)
            return jnp.sum(final)

        fn = jax.jit(chain)
        jax.device_get(fn(params, mixture))  # compile + warm
        dt = max(
            median_fetch_seconds(fn, params, mixture, trials=a.trials)
            - rtt, 1e-9)
        return dt / a.inner

    def strip800(name):
        return name.replace("@800", "") if name else name

    configs = [
        ("as-probed", dict(as_probed_singles), dict(as_probed_pairs)),
        ("pair(1,2)=pair_f32", dict(as_probed_singles),
         {**as_probed_pairs, (1, 2): "pair_f32"}),
        ("pair(1,2)=pair", dict(as_probed_singles),
         {**as_probed_pairs, (1, 2): "pair"}),
        ("singles=recompute_f32", {d: "recompute_f32" for d in dils},
         {p: None for p in pairs}),
        ("singles=store_f32", {d: "store_f32" for d in dils},
         {p: None for p in pairs}),
        ("as-probed-no800",
         {d: strip800(v) for d, v in as_probed_singles.items()},
         dict(as_probed_pairs)),
    ]

    results = []
    for name, singles, pair_cfg in configs:
        set_state(singles, pair_cfg)
        t0 = time.time()
        try:
            dt = measure()
        except Exception as e:  # noqa: BLE001 — a failed compile loses
            print(f"{name}: FAILED ({type(e).__name__}: {e})",
                  file=sys.stderr)
            continue
        rtf = B * a.seconds / dt
        results.append((dt, name, singles, pair_cfg))
        print(f"{name}: {dt * 1e3:.3f} ms/fwd  ({rtf:,.0f}x realtime)  "
              f"[{time.time() - t0:.0f} s incl. compile]", flush=True)

    if not results:
        print("no configuration measured; nothing persisted")
        return 1
    results.sort(key=lambda r: r[0])
    dt, name, singles, pair_cfg = results[0]
    print(f"winner: {name} at {dt * 1e3:.3f} ms/fwd")

    if not a.apply:
        set_state(as_probed_singles, as_probed_pairs)
        return 0
    set_state(singles, pair_cfg)
    if name != "as-probed":
        cfg_key = (cfg.bottleneck, cfg.hidden, cfg.conv_kernel,
                   cfg.num_blocks, cfg.norm_type, cfg.causal,
                   cfg.compute_dtype)
        fwd_key = "fwd:" + ":".join(str(x) for x in (B, K) + cfg_key)
        tb._autotune_cache_store(
            fwd_key, {str(d): singles.get(d) for d in dils})
        # pair engagement persists as an in-model decision keyed against
        # the ISOLATED-race winners — read those from the pair: disk entry
        # (the in-process registry already has the previous in-model
        # decision applied, which is NOT what apply_cached_decision keys
        # against) — so it re-applies on load and self-invalidates if a
        # pair is ever re-raced.
        pair_disk = tb._autotune_cache_load().get(
            "pair:" + ":".join(str(v) for v in (B, K) + cfg_key)) or {}
        raced_pairs = {p: pair_disk.get(f"{p[0]}-{p[1]}") for p in pairs}
        memo_key = (B, K, cfg.bottleneck, cfg.hidden, cfg.conv_kernel,
                    cfg.num_blocks, cfg.norm_type, cfg.causal,
                    str(jnp.dtype(cfg.compute_dtype)))
        pair_key = "tcn:inmodel-pair:" + ":".join(str(v) for v in memo_key)
        decision = {
            f"p{p[0]}-{p[1]}": {"raced": raced_pairs.get(p),
                                "final": pair_cfg.get(p)}
            for p in pairs
        }
        tb._autotune_cache_store(pair_key, decision)
        print(f"persisted: {fwd_key} + {pair_key}")
    else:
        print("as-probed already optimal; nothing persisted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
