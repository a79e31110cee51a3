"""Streamed-vs-offline parity on REAL trained causal weights.

The unit suite proves the streaming runtime matches the batch causal
forward on random weights (tests/test_streaming.py); this closes the
loop on a *trained* checkpoint: separate one held-out mixture both ways
(StreamingSeparator chunk loop vs the full-utterance causal forward on
the same left-padded input) and report the max deviation plus SI-SNR of
each path against the other.

Usage:
    python scripts/stream_parity.py --model-path exp/final.ckpt \
        --wav data/tt/mix/xxx.wav [--chunk-ms 8]

Prints one JSON line; exits non-zero if the paths diverge beyond the
PCM-scale tolerance. Reference: the reference has no streaming runtime at
all (src/separate.py:17-57 is full-utterance only).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from convtasnet_tpu.data.audio_io import read_wav
from convtasnet_tpu.models.conv_tasnet import ConvTasNet
from convtasnet_tpu.models.streaming import StreamingSeparator
from convtasnet_tpu.train.checkpoint import load_params_for_inference


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-path", required=True, help="causal checkpoint")
    ap.add_argument("--wav", required=True, help="held-out mixture")
    ap.add_argument("--chunk-ms", type=float, default=8.0)
    ap.add_argument("--tol", type=float, default=2e-3,
                    help="max abs sample deviation allowed")
    ap.add_argument("--f32", type=int, default=1,
                    help="compare both paths in float32 (default). The "
                         "check validates the STREAMING runtime (state "
                         "carry, chunk boundaries) against the offline "
                         "causal math; bf16/kernel numerics are gated "
                         "separately (probe rel-err checks), and two bf16 "
                         "paths with different accumulation orders differ "
                         "at ~bf16 eps (~4e-3 rel), swamping a real "
                         "boundary bug at f32 scale.")
    a = ap.parse_args(argv)

    cfg, variables = load_params_for_inference(a.model_path)
    if a.f32:
        import dataclasses

        cfg = dataclasses.replace(cfg, compute_dtype="float32")
    if not cfg.causal:
        print("checkpoint is not causal; nothing to stream", file=sys.stderr)
        return 2
    x, sr = read_wav(a.wav, sample_rate=cfg.sample_rate)
    x = np.asarray(x, np.float32)
    hop = cfg.stride
    chunk = max(hop, int(a.chunk_ms * sr / 1000.0) // hop * hop)
    T = len(x)
    Tp = ((T + chunk - 1) // chunk) * chunk
    buf = np.zeros((1, Tp), np.float32)
    buf[0, :T] = x

    sep = StreamingSeparator(cfg, variables, batch_size=1)
    outs = [np.asarray(sep.process(jnp.asarray(buf[:, o:o + chunk])))
            for o in range(0, Tp, chunk)]
    streamed = np.concatenate(outs, axis=-1)[0, :, :T]  # [C, T]

    pad = cfg.kernel_size - hop
    model = ConvTasNet(cfg)
    offline = np.asarray(model.apply(
        variables, jnp.pad(jnp.asarray(buf), ((0, 0), (pad, 0))),
        train=False))[0, :, :T]

    max_abs = float(np.max(np.abs(streamed - offline)))
    scale = float(np.max(np.abs(offline)) + 1e-9)

    def si_snr(est, ref):
        ref0 = ref - ref.mean(-1, keepdims=True)
        est0 = est - est.mean(-1, keepdims=True)
        proj = (np.sum(est0 * ref0, -1, keepdims=True)
                / (np.sum(ref0 * ref0, -1, keepdims=True) + 1e-9)) * ref0
        noise = est0 - proj
        return float(np.mean(10 * np.log10(
            np.sum(proj ** 2, -1) / (np.sum(noise ** 2, -1) + 1e-12))))

    res = {
        "chunk_ms": a.chunk_ms,
        "max_abs_dev": max_abs,
        "rel_dev": max_abs / scale,
        "si_snr_streamed_vs_offline_db": si_snr(streamed, offline),
        "ok": bool(max_abs <= a.tol * max(1.0, scale)),
    }
    print(json.dumps(res))
    return 0 if res["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
