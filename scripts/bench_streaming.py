"""On-chip streaming bench: the BASELINE "causal streaming variant" config.

Measures the causal (cLN) paper-size model through ``stream_scan`` — the
device-side chunk loop (state never leaves the chip) — at chunk sizes
{L=20 samples (2.5 ms), 10 ms, 100 ms} @ 8 kHz:

- per-chunk compute latency (scan time / n_chunks, RTT-subtracted),
- x realtime (chunk audio seconds / per-chunk seconds),
- plus the one-call ``stream_step`` dispatch cost for the interactive
  serving path (through this harness's relay that is RTT-dominated; on a
  directly-attached chip dispatch adds ~100 us).

Usage: python scripts/bench_streaming.py [--quick]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import init_params
from convtasnet_tpu.models.streaming import init_stream_state, stream_scan
from convtasnet_tpu.utils.timing import median_fetch_seconds, rtt_baseline

SR = 8000


def main(quick: bool = False) -> None:
    from convtasnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = ConvTasNetConfig(norm_type="cLN", causal=True,
                           compute_dtype="bfloat16")
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=4 * SR)
    M = 1  # interactive serving: one stream
    rng = np.random.default_rng(0)

    print(f"# backend={jax.default_backend()} causal cLN paper config, "
          f"M={M}, bf16", flush=True)
    trials = 3 if quick else 5
    for chunk_len, label in ((cfg.kernel_size, "L=20 (2.5 ms)"),
                             (80, "10 ms"), (800, "100 ms")):
        # enough chunks that scan work >> relay RTT jitter
        total_s = 4.0 if quick else 8.0
        n = max(8, int(total_s * SR / chunk_len))
        chunks = jnp.asarray(
            rng.standard_normal((n, M, chunk_len)), jnp.float32)
        state0 = init_stream_state(cfg, M)

        def run(chks):
            st, out = stream_scan(cfg, variables, chks)
            return jnp.sum(out) + jnp.sum(st["ola_carry"])

        fn = jax.jit(run)
        rtt = rtt_baseline(chunks, trials=trials)
        t = max(median_fetch_seconds(fn, chunks, trials=trials) - rtt, 1e-9)
        per_chunk = t / n
        audio_s = chunk_len / SR
        print(f"chunk {label:>14}: {per_chunk * 1e6:9.1f} us/chunk  "
              f"{audio_s / per_chunk:9.1f}x realtime  "
              f"(n={n}, scan total {t * 1e3:.2f} ms)", flush=True)

    # single-dispatch latency for the interactive path (one 10 ms chunk)
    from convtasnet_tpu.models.streaming import stream_step

    chunk = jnp.asarray(rng.standard_normal((M, 80)), jnp.float32)
    st = init_stream_state(cfg, M)
    step = jax.jit(lambda s, c: stream_step(cfg, variables, s, c))
    st2, _ = step(st, chunk)  # compile
    rtt = rtt_baseline(chunk, trials=trials)
    t = max(median_fetch_seconds(
        lambda s, c: step(s, c)[1], st, chunk, trials=trials) - rtt, 1e-9)
    print(f"single stream_step (10 ms chunk): {t * 1e3:.3f} ms dispatch+compute "
          f"(relay RTT {rtt * 1e3:.1f} ms subtracted)", flush=True)


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
