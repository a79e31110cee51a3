"""Chunked-batch forward: exploit the VMEM-residency effect at large batch.

Root cause analysis (docs/RESULTS.md "Batch scaling") showed B=8 runs at
44% MFU because XLA homes the inter-block activations in VMEM, while B=32
spills them to HBM (34% MFU). This experiment runs a B=32 forward as a
``lax.map`` over four B=8 slices inside one jit — each slice's inter-block
buffers are small enough to be VMEM-homed again, trading zero math for
restored residency.

Usage: python scripts/bench_chunked.py [batch] [chunk] [separator]
(the same VMEM-residency effect applies to the dual-path family — pass
``dpt`` to measure it there)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(batch: int = 32, chunk: int = 8, separator: str = "tcn") -> None:
    from convtasnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params
    from convtasnet_tpu.ops.pallas.tcn_block import ensure_probed
    from convtasnet_tpu.utils.timing import time_chained

    sr, seconds = 8000, 4.0
    T = int(seconds * sr)
    cfg = ConvTasNetConfig(compute_dtype="bfloat16", separator=separator,
                           use_pallas=jax.default_backend() != "cpu")
    ensure_probed(cfg, chunk, T, verbose=True)   # probe at the CHUNK shape
    ensure_probed(cfg, batch, T, verbose=True)   # and the full shape
    model = ConvTasNet(cfg)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    params = variables["params"]

    def fwd_full(m):
        out = model.apply({"params": params}, m)
        return jnp.sum(out, axis=1)

    def fwd_chunked(m):
        mm = m.reshape(batch // chunk, chunk, T)
        out = jax.lax.map(
            lambda c: model.apply({"params": params}, c), mm)
        return jnp.sum(out, axis=2).reshape(batch, T)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, T)), jnp.float32)
    for name, fn in (("full", fwd_full), ("chunked", fwd_chunked)):
        t = time_chained(fn, x, inner=10)
        rtf = batch * seconds / t
        print(f"{name:>8} B={batch} (chunk={chunk if name=='chunked' else '-'}):"
              f" {t * 1e3:7.2f} ms  {rtf:8.0f}x realtime", flush=True)


if __name__ == "__main__":
    from convtasnet_tpu.ops.pallas import probe_budget

    # measurement scripts want the FULL race, not the bench/driver's
    # deadline-capped subset (explicit env still wins)
    if not os.environ.get("CONVTASNET_PROBE_BUDGET", "").strip():
        probe_budget.begin(0)
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sep = sys.argv[3] if len(sys.argv) > 3 else "tcn"
    main(b, c, sep)
