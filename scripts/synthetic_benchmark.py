"""End-to-end training-quality validation on a synthetic speech-like corpus.

wsj0 audio is licensed and not present in this environment, so the SI-SNRi
quality gate runs on a generated two-"speaker" corpus instead: each speaker
class is an AM-modulated harmonic stack with a class-specific f0 range plus
shaped noise — mixtures are separable but non-trivial (spectra overlap).
The script builds the corpus with the framework's own mixture tools
(P.56-normalized, SNR-jittered), trains the model through the real Solver
path, and reports SI-SNRi on a held-out test set.

Usage: python scripts/synthetic_benchmark.py [--epochs 20] [--out /tmp/synth]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_speaker(rng, cls: int, n: int, sr: int) -> np.ndarray:
    """Speech-like signal: harmonic stack with drifting f0 + AM + noise."""
    f0_lo, f0_hi = [(90, 150), (180, 290), (330, 500)][cls]
    t = np.arange(n) / sr
    # piecewise-constant f0 contour (phoneme-ish 150 ms segments)
    seg = int(0.15 * sr)
    n_seg = n // seg + 1
    f0s = rng.uniform(f0_lo, f0_hi, n_seg)
    f0 = np.repeat(f0s, seg)[:n]
    phase = 2 * np.pi * np.cumsum(f0) / sr
    x = np.zeros(n)
    for h in range(1, 9):
        amp = rng.uniform(0.3, 1.0) / h
        x += amp * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    # syllabic amplitude modulation (~3 Hz) with pauses
    env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2, 4) * t + rng.uniform(0, 7)))
    env = env ** 1.5
    gate = (rng.uniform(size=n_seg) > 0.25).astype(float)
    env *= np.repeat(gate, seg)[:n]
    x = x * env + 0.02 * rng.standard_normal(n)
    return (0.5 * x / (np.abs(x).max() + 1e-9)).astype(np.float32)


def build_corpus(root: str, sr: int, n_tr: int, n_cv: int, n_tt: int,
                 dur_s: float, seed: int = 0, num_speakers: int = 2) -> None:
    from convtasnet_tpu.data.audio_io import write_wav
    from convtasnet_tpu.tools.mixture import MixRow, create_mixtures

    rng = np.random.default_rng(seed)
    src_dir = os.path.join(root, "sources")
    os.makedirs(src_dir, exist_ok=True)
    counts = {"tr": n_tr, "cv": n_cv, "tt": n_tt}
    n = int(dur_s * sr)
    for split, count in counts.items():
        rows = []
        for i in range(count):
            paths = []
            for cls in range(num_speakers):
                p = os.path.join(src_dir, f"{split}_{i:04d}_c{cls}.wav")
                write_wav(p, synth_speaker(rng, cls, n, sr), sr)
                paths.append(p)
            snr = rng.uniform(0.01, 2.5)
            snrs = [round(snr, 3), round(-snr, 3)]
            while len(snrs) < num_speakers:
                snrs.append(round(float(rng.uniform(-2.5, 2.5)), 3))
            rows.append(MixRow(tuple(paths), tuple(snrs[:num_speakers])))
        create_mixtures(rows, os.path.join(root, split), sr, mode="min")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_bench")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n-tr", type=int, default=120)
    ap.add_argument("--n-cv", type=int, default=12)
    ap.add_argument("--n-tt", type=int, default=16)
    ap.add_argument("--dur", type=float, default=5.0)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--segment", type=float, default=2.0)
    ap.add_argument("--N", type=int, default=128)
    ap.add_argument("--H", type=int, default=256)
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--X", type=int, default=6)
    ap.add_argument("--R", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--speakers", type=int, default=2)
    ap.add_argument("--mask-nonlinear", default="relu")
    ap.add_argument("--separator", default="tcn", choices=["tcn", "dpt"])
    ap.add_argument("--dpt-chunk", type=int, default=0,
                    help="dual-path intra-chunk length (0 = config default)")
    ap.add_argument("--dpt-heads", type=int, default=0,
                    help="override dpt attention heads (0 = config default)")
    ap.add_argument("--dpt-layers", type=int, default=0,
                    help="override dual-path layer count (0 = default)")
    ap.add_argument("--steps-per-call", type=int, default=1)
    ap.add_argument("--n-model", type=int, default=1,
                    help="model-parallel mesh axis (dpt: fused-kernel "
                         "shard_map TP train step)")
    ap.add_argument("--sample-rate", type=int, default=8000)
    ap.add_argument("--L", type=int, default=20,
                    help="encoder filter length (40 keeps the 2.5 ms paper "
                         "window at 16 kHz)")
    ap.add_argument("--use-pallas", type=int, default=-1)
    ap.add_argument("--causal", type=int, default=0,
                    help="train the causal config (left-pad-only blocks; "
                         "pair with --norm-type cLN like the reference's "
                         "causal mode, src/conv_tasnet.py:182)")
    ap.add_argument("--norm-type", default="gLN",
                    choices=["gLN", "cLN", "BN"])
    ap.add_argument("--continue-from", default="",
                    help="resume an interrupted gate from a checkpoint "
                         "(e.g. <out>/exp/preempted.ckpt)")
    a = ap.parse_args(argv)
    sr = a.sample_rate

    t0 = time.time()
    corpus = os.path.join(a.out, "data")
    if not os.path.exists(os.path.join(corpus, "tt", "mix")):
        print("building corpus...", flush=True)
        build_corpus(corpus, sr, a.n_tr, a.n_cv, a.n_tt, a.dur,
                     num_speakers=a.speakers)
    print(f"corpus ready ({time.time() - t0:.0f}s)", flush=True)

    from convtasnet_tpu.cli import main as cli_main

    jd = os.path.join(a.out, "json")
    cli_main(["preprocess", "--data-dir", corpus, "--out-dir", jd,
              "--sample-rate", str(sr), "--C", str(a.speakers)])
    exp = os.path.join(a.out, "exp")
    cli_main([
        "train", "--train-dir", os.path.join(jd, "tr"),
        "--valid-dir", os.path.join(jd, "cv"),
        "--save-folder", exp,
        "--N", str(a.N), "--H", str(a.H), "--B", str(a.B),
        "--L", str(a.L),
        "--X", str(a.X), "--R", str(a.R), "--C", str(a.speakers),
        "--mask-nonlinear", a.mask_nonlinear,
        "--separator", a.separator,
        "--sample-rate", str(sr),
        "--segment", str(a.segment), "--batch-size", str(a.batch_size),
        "--epochs", str(a.epochs), "--lr", str(a.lr),
        "--print-freq", "5", "--compute-dtype", "bfloat16",
        "--steps-per-call", str(a.steps_per_call),
        "--use-pallas", str(a.use_pallas),
        "--n-model", str(a.n_model),
        "--causal", str(a.causal), "--norm-type", a.norm_type,
    ] + (["--dpt-heads", str(a.dpt_heads)] if a.dpt_heads else [])
      + (["--dpt-layers", str(a.dpt_layers)] if a.dpt_layers else [])
      + (["--dpt-chunk", str(a.dpt_chunk)] if a.dpt_chunk else [])
      + (["--continue-from", a.continue_from] if a.continue_from else []))
    from convtasnet_tpu.infer.evaluate import evaluate

    res = evaluate(os.path.join(exp, "final.ckpt"), os.path.join(jd, "tt"),
                   sample_rate=sr, verbose=False)
    res["wall_s"] = round(time.time() - t0, 1)
    print("RESULT " + json.dumps(res), flush=True)
    with open(os.path.join(a.out, "result.json"), "w") as f:
        json.dump(res, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
