"""Batch-scaling root-cause matrix (round-2 VERDICT weak #3).

Observed: per-element forward cost grows ~30% from B=8 -> 32 on BOTH the
fused Pallas path and the XLA ops path (docs/RESULTS.md batch-scaling
table). Same ratio on two unrelated code paths points away from kernel
structure; this script runs discriminating experiments:

  A. pure-matmul control: MXU-only chained GEMMs at the block's shapes,
     batch-scaled. If this degrades too, the cause is chip-level
     (sustained-clock/DVFS), not kernel scheduling.
  B. duration control: same B=8 block, chain length x4/x16. If per-iter
     cost rises with *sustained duration* rather than batch size, it's
     throttling; if flat, it's genuinely per-shape.
  C. fused block + XLA block at B in {8,16,32} (the baseline table).
  D. tile sweep at B=8/32 for the fused kernel (400..3200): is the fixed
     tile=1600 simply wrong at large B?
  E. K-split alternative at B=32: run the same kernel as 4 sequential
     calls on [32, K/4, B] slices (gLN stats break, so this is a timing
     probe only, cLN mode) — isolates "bigger grid" from "bigger batch".

Usage: python scripts/bench_scaling.py [--quick]
Writes a markdown table to stdout; every number is RTT-subtracted
(utils/timing protocol).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from convtasnet_tpu.models.functional import block_forward
from convtasnet_tpu.ops.conv import depthwise_conv1d
from convtasnet_tpu.ops.norm import global_layer_norm
from convtasnet_tpu.ops.pallas.tcn_block import fused_tcn_block
from convtasnet_tpu.utils.timing import time_chained

K, B, H, P = 3199, 256, 512, 3
D = 16  # representative dilation
PEAK_BF16 = 197e12  # v5e MXU peak


def params(dt):
    rng = np.random.default_rng(0)
    return dict(
        w_in=jnp.asarray(rng.standard_normal((B, H)) / np.sqrt(B), dt),
        dw=jnp.asarray(rng.standard_normal((P, H)) * 0.1, dt),
        w_out=jnp.asarray(rng.standard_normal((H, B)) / np.sqrt(H), dt),
        g=jnp.ones((H,), jnp.float32), b=jnp.zeros((H,), jnp.float32),
        a=jnp.float32(0.25))


def xla_fn(p, d=D, norm_type="gLN"):
    blk = {"conv1x1": p["w_in"], "prelu1": p["a"], "dwconv": p["dw"],
           "prelu2": p["a"], "pwconv": p["w_out"]}

    def norm(h):
        return global_layer_norm(
            h.astype(jnp.float32), p["g"], p["b"]).astype(h.dtype)

    return lambda xx: block_forward(
        blk, xx, dwconv=lambda h, w: depthwise_conv1d(h, w, d, False),
        norm1=norm, norm2=norm)


def fused_fn(p, d=D, tile=1600, store=False, h_dtype=None,
             norm_type="gLN"):
    return lambda xx: fused_tcn_block(
        xx, p["w_in"], p["dw"], p["w_out"], p["a"], p["a"],
        p["g"], p["b"], p["g"], p["b"], dilation=d, causal=False,
        norm_type=norm_type, tile=tile, store_h2=store, h_dtype=h_dtype,
        interpret=jax.default_backend() == "cpu")


def block_flops(m, k=None):
    k = k or K
    return 2 * m * k * B * H * 2  # the two MXU matmuls (dominant term)


def report(label, m, t, k=None):
    fl = block_flops(m, k)
    print(f"{label:<42} {t * 1e3:8.3f} ms  {t / m * 1e3:7.4f} ms/elem  "
          f"MFU {fl / t / PEAK_BF16 * 100:5.1f}%", flush=True)
    return t


def main(quick=False):
    dt = jnp.bfloat16
    p = params(dt)
    rng = np.random.default_rng(1)
    xs = {m: jnp.asarray(rng.standard_normal((m, K, B)), dt)
          for m in (8, 16, 32)}
    inner = 30 if quick else 60

    print(f"# backend={jax.default_backend()} d={D} K={K} B={B} H={H}")

    print("\n## A. pure-matmul control (x@W1@W2 chained, MXU-only)")
    w1 = p["w_in"]
    w2 = p["w_out"]
    for m in (8, 16, 32):
        fn = lambda xx: jnp.dot(jnp.dot(xx, w1), w2)  # noqa: E731
        t = time_chained(fn, xs[m], inner=inner * 4)
        fl = 2 * m * K * B * H * 2
        print(f"matmul-pair M={m:<3} {t * 1e3:8.3f} ms  "
              f"{t / m * 1e3:7.4f} ms/elem  MFU {fl / t / PEAK_BF16 * 100:5.1f}%",
              flush=True)

    print("\n## B. duration control (fused block, B=8, chain length up)")
    for n in (inner, inner * 4, inner * 16):
        t = time_chained(fused_fn(p), xs[8], inner=n)
        report(f"fused B=8 inner={n}", 8, t)

    print("\n## C. batch scaling, fused vs XLA")
    for m in (8, 16, 32):
        t = time_chained(fused_fn(p), xs[m], inner=inner)
        report(f"fused  M={m}", m, t)
    for m in (8, 16, 32):
        t = time_chained(xla_fn(p), xs[m], inner=inner)
        report(f"xla    M={m}", m, t)

    print("\n## D. tile sweep (fused, recompute)")
    for m in (8, 32):
        for tile in (400, 800, 1600, 3200):
            try:
                t = time_chained(fused_fn(p, tile=tile), xs[m], inner=inner)
                report(f"fused M={m} tile={tile}", m, t)
            except Exception as e:  # noqa: BLE001
                print(f"fused M={m} tile={tile}: FAILED "
                      f"({type(e).__name__})", flush=True)

    print("\n## E. K-split probe (cLN so stats stay local; 4 x K/4)")
    k4 = 800  # 3200/4
    x32s = jnp.asarray(
        np.random.default_rng(2).standard_normal((32, k4, B)), dt)
    fn_part = fused_fn(p, norm_type="cLN")
    t = time_chained(fn_part, x32s, inner=inner * 4)
    report("fused cLN M=32 K=800 (quarter-K)", 32, t, k=k4)
    t = time_chained(fused_fn(p, norm_type="cLN"), xs[32], inner=inner)
    report("fused cLN M=32 K=3199 (full-K)", 32, t)
    t = time_chained(fused_fn(p, norm_type="cLN"), xs[8], inner=inner)
    report("fused cLN M=8  K=3199 (full-K)", 8, t)


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
