"""Real-time streaming separation demo with serving-latency statistics.

The reference has no low-latency deployment story at all (inference is
full-utterance, ``src/separate.py:17-57``); this exercises the causal
streaming runtime (``models/streaming.py``) the way a serving process
would: fixed-size chunks arrive one at a time, each ``process`` call must
return before the next chunk lands, and the budget per chunk is the chunk
duration itself.

Reports per-chunk wall latency (p50/p95/p99/max), the real-time factor,
and whether the run met its deadline (p99 < chunk duration); optionally
writes the separated streams for listening checks.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from convtasnet_tpu.data.audio_io import read_wav, write_wav
from convtasnet_tpu.models.streaming import StreamingSeparator
from convtasnet_tpu.train.checkpoint import load_params_for_inference


def stream_demo(
    model_path: str,
    wav_path: str,
    chunk_ms: float = 8.0,
    out_dir: Optional[str] = None,
    realtime: bool = False,
) -> Dict[str, float]:
    """Stream one wav through the causal separator chunk by chunk.

    Args:
        model_path: causal (cLN/BN) checkpoint.
        wav_path: input mixture.
        chunk_ms: serving chunk size; rounded down to whole encoder hops.
        out_dir: if given, write ``<stem>_s{c}.wav`` separated streams.
        realtime: sleep so chunks arrive at wall-clock rate (a stricter
            emulation of a live audio callback; default off for CI speed).

    Returns:
        {"chunk_ms", "p50_ms", "p95_ms", "p99_ms", "max_ms", "rtf",
         "deadline_met", "latency_ms"} — latency_ms is the algorithmic
        latency (encoder window) plus the chunk duration.
    """
    cfg, variables = load_params_for_inference(model_path)
    x, sr = read_wav(wav_path, sample_rate=cfg.sample_rate)
    hop = cfg.stride
    chunk = max(hop, int(chunk_ms * sr / 1000.0) // hop * hop)
    chunk_s = chunk / sr
    T = len(x)
    Tp = ((T + chunk - 1) // chunk) * chunk
    buf = np.zeros((1, Tp), np.float32)
    buf[0, :T] = x

    sep = StreamingSeparator(cfg, variables, batch_size=1)
    # warm up the compile outside the timed region (a server would too)
    sep.process(jnp.zeros((1, chunk), jnp.float32))
    sep.reset()

    outs = []
    lat = []
    t_start = time.perf_counter()
    for s in range(0, Tp, chunk):
        if realtime:
            target = t_start + (s / sr)
            now = time.perf_counter()
            if now < target:
                time.sleep(target - now)
        t0 = time.perf_counter()
        out = sep.process(jnp.asarray(buf[:, s:s + chunk]))
        out = np.asarray(out)  # force host materialization = full latency
        lat.append(time.perf_counter() - t0)
        outs.append(out)
    outs.append(np.asarray(sep.flush()))
    est = np.concatenate(outs, axis=-1)[0, :, :T]

    lat_ms = np.sort(np.array(lat) * 1e3)
    stats = {
        "chunk_ms": round(1000 * chunk_s, 3),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 3),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
        "max_ms": round(float(lat_ms[-1]), 3),
        "rtf": round((T / sr) / max(float(np.sum(lat)), 1e-9), 2),
        "deadline_met": bool(np.percentile(lat_ms, 99) < 1000 * chunk_s),
        "latency_ms": round(1000 * (cfg.kernel_size / sr + chunk_s), 3),
    }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        stem = os.path.splitext(os.path.basename(wav_path))[0]
        for c in range(est.shape[0]):
            write_wav(os.path.join(out_dir, f"{stem}_s{c + 1}.wav"),
                      est[c], sr)
    return stats


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--wav", required=True)
    ap.add_argument("--chunk-ms", type=float, default=8.0)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--realtime", type=int, default=0)
    a = ap.parse_args(argv)
    stats = stream_demo(a.model_path, a.wav, a.chunk_ms, a.out_dir,
                        realtime=bool(a.realtime))
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
