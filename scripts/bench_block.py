"""Per-dilation TCN-block microbenchmark on the current backend.

Compares, at the paper shapes ([M, 3199, 256] bf16, H=512, gLN):
- the XLA ops path (models/functional.block_forward),
- the fused Pallas kernel, stored-h2 variant,
- the fused Pallas kernel, recompute variant.

Method matches bench.py: N iterations chained in one jitted lax.scan
(output fed back as input), fetched once, RTT-subtracted.

Usage: python scripts/bench_block.py [M] [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from convtasnet_tpu.models.functional import block_forward
from convtasnet_tpu.ops.conv import depthwise_conv1d
from convtasnet_tpu.ops.norm import global_layer_norm
from convtasnet_tpu.ops.pallas.tcn_block import fused_tcn_block

INNER = 50


def time_chain(fn, x, trials=5):
    from convtasnet_tpu.utils.timing import time_chained

    return time_chained(fn, x, inner=INNER, trials=trials)


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 3199
    B, H, P = 256, 512, 3
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((M, K, B)), dt)
    w_in = jnp.asarray(rng.standard_normal((B, H)) / np.sqrt(B), dt)
    dw = jnp.asarray(rng.standard_normal((P, H)) * 0.1, dt)
    w_out = jnp.asarray(rng.standard_normal((H, B)) / np.sqrt(H), dt)
    g = jnp.ones((H,), jnp.float32)
    b = jnp.zeros((H,), jnp.float32)
    a = jnp.float32(0.25)

    def xla_fn(d):
        blk = {"conv1x1": w_in, "prelu1": a, "dwconv": dw,
               "prelu2": a, "pwconv": w_out}

        def norm(h):
            return global_layer_norm(
                h.astype(jnp.float32), g, b).astype(h.dtype)

        return lambda xx: block_forward(
            blk, xx, dwconv=lambda h, w: depthwise_conv1d(h, w, d, False),
            norm1=norm, norm2=norm)

    def fused_fn(d, store):
        return lambda xx: fused_tcn_block(
            xx, w_in, dw, w_out, a, a, g, b, g, b, dilation=d, causal=False,
            norm_type="gLN", store_h2=store,
            interpret=jax.default_backend() == "cpu")

    print(f"# M={M} K={K} B={B} H={H} backend={jax.default_backend()}")
    print(f"{'d':>4} {'xla_ms':>8} {'fused_store':>12} {'fused_recomp':>13}")
    for d in (1, 2, 4, 8, 16, 32, 64, 128):
        row = [f"{d:>4}"]
        t = time_chain(xla_fn(d), x)
        row.append(f"{t * 1e3:8.3f}")
        for store in (True, False):
            try:
                t = time_chain(fused_fn(d, store), x)
                row.append(f"{t * 1e3:12.3f}")
            except Exception as e:
                row.append(f"  FAIL({type(e).__name__})")
        print(" ".join(row), flush=True)


if __name__ == "__main__":
    main()
