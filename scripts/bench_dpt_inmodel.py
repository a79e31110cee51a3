"""In-model marginal value of each fused DPT sublayer kernel.

The sublayer probes (probe_fused_inter / _intra / _ffn) pick winners by
racing the sublayer in isolation, but a Pallas custom call is a fusion
barrier: engaging it changes how XLA fuses the *surrounding* ops and what
stays VMEM-resident between sublayers. Round-3 on-chip logs showed the
intra kernel winning its isolated race (0.27 vs 0.41 ms/sublayer) while
making the full B=8 forward ~1.4 ms SLOWER; at B=32 it helped. This
measures the thing that actually matters: full-model forward time with
each sublayer's registry winner toggled, per batch size.

For each batch: probe everything at that batch, then time the full jitted
forward under a matrix of registry settings — as-probed, each sublayer
demoted to XLA, each non-winning candidate forced — printing ms, ms/elem,
and MFU per variant. The output decides the probe policy (per-batch
registry keys / in-model race / batch-gated demotion).

Usage: python scripts/bench_dpt_inmodel.py [--batches 8 32] [--trials 5]
"""

from __future__ import annotations

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from bench_train import V5E_BF16_PEAK, _rtt, forward_flops  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--skip-forced", action="store_true",
                    help="only as-probed + per-sublayer XLA demotions")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params
    from convtasnet_tpu.ops.pallas import dpt_attention, dpt_ffn, dpt_intra
    from convtasnet_tpu.ops.pallas.tcn_block import ensure_probed
    from convtasnet_tpu.utils.compile_cache import enable_compile_cache
    from convtasnet_tpu.utils.timing import median_fetch_seconds

    enable_compile_cache()
    cfg = ConvTasNetConfig(compute_dtype="bfloat16", use_pallas=True,
                           separator="dpt")
    T = int(a.seconds * 8000)
    K = (T - cfg.kernel_size) // cfg.stride + 1
    S = cfg.dpt_chunk
    n = -(-K // S)
    Bc, h = cfg.bottleneck, cfg.dpt_num_heads
    model = ConvTasNet(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    params = variables["params"]
    print(f"# backend={jax.default_backend()} in-model DPT ablation "
          f"n={n} S={S} B={Bc} h={h}", flush=True)

    def make_regs(M):
        akey = (M, n, S, Bc, h, "bfloat16")
        fkey = (M, n * S, Bc, cfg.dpt_ff, "bfloat16")
        return {
            "intra": (dpt_intra._INTRA_READY, akey),
            "inter": (dpt_attention._DPT_READY, akey),
            "ffn": (dpt_ffn._FFN_READY, fkey),
        }

    def time_full(M, mixture):
        def chain(p, m):
            def body(carry, _):
                out = model.apply({"params": p}, carry)
                return jnp.sum(out, axis=1), jnp.float32(0)

            final, _ = jax.lax.scan(body, m, None, length=a.inner)
            return jnp.sum(final)

        fwd = jax.jit(chain)
        rtt = _rtt(mixture)
        dt = max(median_fetch_seconds(fwd, params, mixture,
                                      trials=a.trials) - rtt, 1e-9)
        return dt / a.inner

    for M in a.batches:
        ensure_probed(cfg, M, T)
        regs = make_regs(M)
        probed = {nm: reg.get(key) for nm, (reg, key) in regs.items()}
        print(f"B={M} probed winners: {probed}", flush=True)
        variants = [("as-probed", {})]
        for nm in regs:
            if probed[nm] is not None:
                variants.append((f"{nm}=xla", {nm: None}))
        if not a.skip_forced:
            for ct in dpt_intra._chunk_tiles(n):
                if ct != probed["intra"]:
                    variants.append((f"intra=ct{ct}", {"intra": ct}))
            for kt in (400, 800):
                if kt != probed["ffn"] and (n * S) % kt == 0:
                    variants.append((f"ffn=kt{kt}", {"ffn": kt}))
        rng = np.random.default_rng(0)
        mixture = jnp.asarray(rng.standard_normal((M, T)), jnp.float32)
        f = forward_flops(cfg, T) * M
        base = None
        for name, overrides in variants:
            for nm, (reg, key) in regs.items():
                reg[key] = overrides.get(nm, probed[nm])
            try:
                dt = time_full(M, mixture)
            except Exception as e:  # noqa: BLE001 — forced variant may OOM
                print(f"B={M} {name:12s}: FAILED ({type(e).__name__})",
                      flush=True)
                continue
            if name == "as-probed":
                base = dt
            delta = f" ({(dt / base - 1) * 100:+.1f}% vs as-probed)" \
                if base and name != "as-probed" else ""
            print(f"B={M} {name:12s}: {dt * 1e3:7.2f} ms "
                  f"({dt / M * 1e3:.3f} ms/elem, MFU~{f / dt / V5E_BF16_PEAK:.1%})"
                  f"{delta}", flush=True)
        for nm, (reg, key) in regs.items():  # restore probed state
            reg[key] = probed[nm]


if __name__ == "__main__":
    from convtasnet_tpu.ops.pallas import probe_budget

    # measurement scripts want the FULL race, not the bench/driver's
    # deadline-capped subset (explicit env still wins)
    if not os.environ.get("CONVTASNET_PROBE_BUDGET", "").strip():
        probe_budget.begin(0)
    main()
