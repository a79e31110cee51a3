"""Compile + numerics-gate the tensor-parallel PARTIAL kernels on ONE chip.

The multi-chip dryrun exercises ``tcn_block_tp`` / ``dpt_tp`` in interpret
mode on a virtual CPU mesh only; this proves Mosaic actually lowers the
partial kernels (shard-local widths) on real hardware. A TP shard executes
exactly these shapes, so one chip's probe validates and times what every
shard of an ``n_model``-way split would run — no mesh needed.

Usage:
    python scripts/probe_tp_onchip.py [--n-model 2] [--batch 8] [--sec 4]
        [--train 1] [--family both|tcn|dpt]

Prints the probe logs (winners persist under ``tcn:tp:*`` / ``dpt:tp:*``
autotune keys); any compile/numerics failure degrades that kernel to the
partial-XLA path exactly as in production. Exit 0 as long as the probes
ran (degradation is a logged outcome, not an error).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-model", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sec", type=float, default=4.0)
    ap.add_argument("--train", type=int, default=1)
    ap.add_argument("--family", default="both",
                    choices=["both", "tcn", "dpt"])
    a = ap.parse_args(argv)

    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(f"# backend={jax.default_backend()} n_model={a.n_model} "
          f"batch={a.batch} T={int(a.sec * 8000)}", flush=True)
    T = int(a.sec * 8000)

    if a.family in ("both", "tcn"):
        from convtasnet_tpu.ops.pallas.tcn_block_tp import ensure_probed_tcn_tp

        cfg = ConvTasNetConfig(compute_dtype="bfloat16", use_pallas=True)
        print(f"## tcn paper config: H={cfg.hidden} -> "
              f"Hs={cfg.hidden // a.n_model}", flush=True)
        ensure_probed_tcn_tp(cfg, a.n_model, a.batch, T, verbose=True,
                             train=bool(a.train))

    if a.family in ("both", "dpt"):
        from convtasnet_tpu.parallel.dpt_tp import ensure_probed_dpt_tp

        cfg = ConvTasNetConfig(separator="dpt", compute_dtype="bfloat16",
                               use_pallas=True)
        print(f"## dpt quality-default: heads={cfg.dpt_num_heads} -> "
              f"local={cfg.dpt_num_heads // a.n_model}", flush=True)
        ensure_probed_dpt_tp(cfg, a.n_model, a.batch, T, verbose=True,
                             train=bool(a.train))
    print("done", flush=True)
    return 0


if __name__ == "__main__":
    from convtasnet_tpu.ops.pallas import probe_budget

    # measurement scripts want the FULL race, not the bench/driver's
    # deadline-capped subset (explicit env still wins)
    if not os.environ.get("CONVTASNET_PROBE_BUDGET", "").strip():
        probe_budget.begin(0)
    sys.exit(main())
