"""Manifest construction: wav directory -> JSON list of (path, num_samples).

Capability parity with ``src/preprocess.py:12-43`` (``preprocess`` /
``preprocess_one_dir``): for each of {tr,cv,tt} x {mix,s1..sC} dump
``<part>.json`` holding ``[[abs_path, num_samples], ...]``.

Differences: sample counts come from the WAV header (no full decode — the
reference librosa-loads every file just to count samples), scaled by the
resampling ratio when the target rate differs; speaker count is a parameter
instead of the hardcoded s1/s2.
"""

from __future__ import annotations

import json
import math
import os
from typing import List, Optional, Sequence, Tuple

from convtasnet_tpu.data.audio_io import wav_duration_samples


def _resampled_len(n: int, native_sr: int, target_sr: int) -> int:
    """Output length of polyphase resampling (matches scipy.resample_poly)."""
    if native_sr == target_sr:
        return n
    g = math.gcd(native_sr, target_sr)
    up, down = target_sr // g, native_sr // g
    return int(math.ceil(n * up / down))


def _native_sr(path: str) -> int:
    import struct

    with open(path, "rb") as f:
        f.read(12)
        while True:
            head = f.read(8)
            cid, size = struct.unpack("<4sI", head)
            if cid == b"fmt ":
                return struct.unpack("<HHIIHH", f.read(16))[2]
            f.seek(size + (size % 2), 1)


def build_manifest(
    wav_dir: str, out_dir: str, part: str, sample_rate: int = 8000
) -> str:
    """Scan ``wav_dir`` for .wav files, write ``out_dir/<part>.json``.

    Parity: ``preprocess_one_dir`` (``src/preprocess.py:12-27``). Returns the
    json path.
    """
    infos: List[Tuple[str, int]] = []
    for name in sorted(os.listdir(wav_dir)):
        if not name.endswith(".wav"):
            continue
        path = os.path.abspath(os.path.join(wav_dir, name))
        n = wav_duration_samples(path)
        infos.append((path, _resampled_len(n, _native_sr(path), sample_rate)))
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, part + ".json")
    with open(out_path, "w") as f:
        json.dump(infos, f, indent=4)
    return out_path


def build_manifests(
    data_dir: str,
    out_dir: str,
    sample_rate: int = 8000,
    splits: Sequence[str] = ("tr", "cv", "tt"),
    num_speakers: int = 2,
    parts: Optional[Sequence[str]] = None,
) -> None:
    """Build all manifests for a wsj0-2mix-style tree
    ``data_dir/{tr,cv,tt}/{mix,s1..sC}/*.wav`` (parity: ``src/preprocess.py:29-43``)."""
    if parts is None:
        parts = ["mix"] + [f"s{i+1}" for i in range(num_speakers)]
    for split in splits:
        for part in parts:
            wav_dir = os.path.join(data_dir, split, part)
            if not os.path.isdir(wav_dir):
                continue
            build_manifest(wav_dir, os.path.join(out_dir, split), part, sample_rate)
