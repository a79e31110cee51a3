"""Dual-path separator design-space sweep on the current backend.

The paper-size DPT forward sits at ~19.5% MFU untuned (docs/RESULTS.md).
Its FLOPs are plain MXU einsums, so the headroom is structural: the chunk
size S trades intra-attention size (O(S) per frame) against inter-attention
size (O(K/S)), and the head count sets the attention-einsum contraction
depth (d_model/heads; the MXU wants >=128 when it can get it). This sweeps
(dpt_chunk, dpt_heads) at the paper d_model and reports ms/elem + MFU per
point, so serving/training configs can pick the fastest shape at equal
parameter count (heads/chunk don't change the parameter count).

Usage: python scripts/bench_dpt.py [--batch 8] [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from bench_train import V5E_BF16_PEAK, bench_forward, forward_flops  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--quick", action="store_true",
                    help="chunk {128, 256} x heads {8} only")
    a = ap.parse_args()

    import jax

    print(f"# backend={jax.default_backend()} separator=dpt sweep "
          f"B={a.batch}", flush=True)
    chunks = (128, 256) if a.quick else (64, 128, 256)
    heads = (8,) if a.quick else (4, 8)
    rows = []
    for S in chunks:
        for h in heads:
            dt, cfg, T = bench_forward(
                a.batch, use_pallas=False, separator="dpt",
                cfg_overrides={"dpt_chunk": S, "dpt_heads": h})
            f = forward_flops(cfg, T) * a.batch
            mfu = f / dt / V5E_BF16_PEAK
            rt = a.batch * 4.0 / dt
            rows.append((S, h, dt, mfu, rt))
            print(f"chunk={S:3d} heads={h}: {dt * 1e3:7.2f} ms "
                  f"({dt / a.batch * 1e3:.3f} ms/elem, {rt:5.0f}x realtime, "
                  f"MFU~{mfu:.1%})", flush=True)
    best = min(rows, key=lambda r: r[2])
    print(f"best: chunk={best[0]} heads={best[1]} "
          f"({best[2] * 1e3:.2f} ms, MFU~{best[3]:.1%})", flush=True)


if __name__ == "__main__":
    main()
