"""Where does the dual-path forward's time go? Per-sublayer ablation.

The quality-default DPT shape (heads = head-dim 32) serves ~2x slower than
the head-dim-64 point (docs/RESULTS.md), and a fused attention kernel is
the named backlog item. Before writing one, this times each sublayer in
isolation at the paper shape on the real chip, so the kernel targets the
actual hot spot:

- intra attention sublayer  (LN + QKV + MHA over S + out proj + residual)
- inter attention sublayer  (same over the chunk axis)
- FFN sublayer              (LN + GELU MLP + residual)
- bare masked_mha on pre-projected q/k/v (isolates the attention math
  from the projections)

Each piece is chained through ``lax.scan`` and RTT-compensated
(utils/timing.time_chained). Sublayers are residual, so chaining is
shape-stable and keeps XLA from constant-folding the weights away.

Usage: python scripts/bench_dpt_ablate.py [--batch 8] [--heads 8 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--heads", type=int, nargs="+", default=[8, 4])
    ap.add_argument("--chunk", type=int, default=128)
    a = ap.parse_args()

    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.dual_path import (
        _AttentionSublayer,
        _FFNSublayer,
    )
    from convtasnet_tpu.utils.compile_cache import enable_compile_cache
    from convtasnet_tpu.utils.timing import time_chained

    enable_compile_cache()
    cfg = ConvTasNetConfig(compute_dtype="bfloat16", separator="dpt",
                           dpt_chunk=a.chunk)
    T = int(a.seconds * 8000)
    K = (T - cfg.kernel_size) // cfg.stride + 1
    S, B = cfg.dpt_chunk, cfg.bottleneck
    n = -(-K // S)
    M = a.batch
    print(f"# backend={jax.default_backend()} M={M} n={n} S={S} B={B} "
          f"layers={cfg.dpt_layers}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, n, S, B)), jnp.bfloat16)
    frame_valid = jnp.ones((n, S), bool)

    def bind(mod, xx, *args):
        vs = mod.init(jax.random.PRNGKey(0), xx, *args)
        return lambda y: mod.apply(vs, y, *args)

    def bare_attn(axis, h):
        # the attention einsums alone (q=k=v=y, no projections); residual
        # add keeps the chain shape-stable
        def f(y):
            qh = y.reshape(M, n, S, h, B // h)
            if axis == 2:
                logits = jnp.einsum("mnqhd,mnkhd->mnhqk", qh, qh)
                w = jax.nn.softmax(logits.astype(jnp.float32),
                                   axis=-1).astype(y.dtype)
                a_ = jnp.einsum("mnhqk,mnkhd->mnqhd", w, qh)
            else:
                logits = jnp.einsum("mqshd,mkshd->mshqk", qh, qh)
                w = jax.nn.softmax(logits.astype(jnp.float32),
                                   axis=-1).astype(y.dtype)
                a_ = jnp.einsum("mshqk,mkshd->mqshd", w, qh)
            return y + a_.reshape(M, n, S, B)

        return f

    for h in a.heads:
        intra = bind(_AttentionSublayer(B, h, attend_axis=2), x, frame_valid)
        inter = bind(_AttentionSublayer(B, h, attend_axis=1), x, frame_valid)
        t_intra = time_chained(intra, x)
        t_inter = time_chained(inter, x)
        t_mha_i = time_chained(bare_attn(2, h), x)
        t_mha_t = time_chained(bare_attn(1, h), x)
        print(f"heads={h}: intra_att {t_intra * 1e3:7.3f} ms | "
              f"inter_att {t_inter * 1e3:7.3f} ms | "
              f"bare attn intra {t_mha_i * 1e3:7.3f} ms | "
              f"inter {t_mha_t * 1e3:7.3f} ms", flush=True)

    ffn = bind(_FFNSublayer(B, cfg.dpt_ff), x)
    t_ffn = time_chained(ffn, x)
    per_layer = 2 * t_ffn
    print(f"ffn (either path) {t_ffn * 1e3:7.3f} ms  "
          f"(x2 per dual-path layer = {per_layer * 1e3:.3f} ms)", flush=True)
    print("note: full layer = intra_att + inter_att + 2*ffn; model = "
          f"{cfg.dpt_layers} layers + bottleneck/mask/encoder/decoder",
          flush=True)


if __name__ == "__main__":
    main()
