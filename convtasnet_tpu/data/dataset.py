"""Batch planning and segment loading.

Replicates the *data semantics* of the reference loader so that training sees
the same audio (SURVEY §7 "hard parts" (a)):

- length-sorted bucketing, static minibatch plan built once at construction
  (``src/data.py:54-115``),
- segment packing: each utterance ≥ segment_len contributes
  ``ceil(len/segment_len)`` 4-s segments, batches hold ≤ ``batch_size``
  segments, an utterance longer than a whole batch gets a batch of its own
  capped at ``batch_size`` segments, short utterances are dropped,
- tail segments re-anchored at ``[-segment_len:]`` (``src/data.py:294-296``),
- ``max_hours`` subset cap with the reference's accounting
  (``src/data.py:103,111``),
- cv/tt mode (``segment < 0``): full utterances, ``batch_size`` per batch,
  utterances longer than ``cv_maxlen`` skipped (``src/data.py:116-140``).

TPU-first differences: all training segments are exactly ``segment_len``
samples so every train batch is a static ``[batch_size, T]`` shape — partial
batches are padded with zero-weight rows instead of shrinking the batch
(weights thread into the loss); eval batches pad time to a bucket multiple to
bound recompilation. The loader is plain numpy on the host; device transfer
lives in ``loader.py``.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from convtasnet_tpu.data.audio_io import read_wav


def load_waves(paths: Sequence[str], sample_rate: int,
               num_samples: int) -> List[np.ndarray]:
    """Decode a group of wavs (one utterance's mix+sources) to float32 mono.

    Hot path: the native C++ batch decoder (``data/native.py``, threaded,
    zero-copy into a dense buffer) when the files are already at the target
    rate; falls back to the numpy codec (+resampler) otherwise.
    """
    from convtasnet_tpu.data import native

    if native.available():
        lib_sr = native.load_library().wav_sample_rate(paths[0].encode())
        if lib_sr == sample_rate:
            audio, lengths = native.decode_batch(
                list(paths), num_samples, num_threads=len(paths))
            if all(int(l) == num_samples for l in lengths):
                return [audio[i] for i in range(len(paths))]
    return [read_wav(p, sample_rate)[0] for p in paths]


@dataclass
class Utterance:
    paths: Tuple[str, ...]  # (mix, s1, ..., sC); eval: just (mix,)
    num_samples: int


@dataclass
class Batch:
    """Host-side training batch with static shapes.

    mixture: [B, T] float32; sources: [B, C, T]; lengths: [B] int32 true
    sample counts; weights: [B] float32, 0 for padding rows.
    """

    mixture: np.ndarray
    lengths: np.ndarray
    sources: np.ndarray
    weights: np.ndarray


def _load_infos(json_dir: str, num_speakers: int) -> List[Utterance]:
    parts = ["mix"] + [f"s{i+1}" for i in range(num_speakers)]
    lists = []
    for part in parts:
        with open(os.path.join(json_dir, part + ".json")) as f:
            lists.append(json.load(f))
    utts = []
    for rows in zip(*lists):
        n = int(rows[0][1])
        assert all(int(r[1]) == n for r in rows), f"length mismatch: {rows}"
        utts.append(Utterance(tuple(r[0] for r in rows), n))
    # Length-sorted descending = bucketing (src/data.py:55-59).
    utts.sort(key=lambda u: u.num_samples, reverse=True)
    return utts


class SeparationDataset:
    """Static minibatch plan over manifest JSONs (parity: ``AudioDataset``).

    ``segment < 0`` selects full-utterance (cv/tt) mode.
    """

    def __init__(
        self,
        json_dir: str,
        batch_size: int,
        sample_rate: int = 8000,
        segment: float = 4.0,
        cv_maxlen: float = 8.0,
        max_hours: Optional[float] = None,
        num_speakers: int = 2,
        pad_rows_to_multiple: int = 1,
        cv_skip_semantics: str = "fixed",
    ):
        self.json_dir = json_dir
        self.batch_size = batch_size
        # Round row counts up to this multiple with zero-weight rows so the
        # batch axis divides evenly over a data-parallel mesh.
        self.pad_rows_to_multiple = max(1, pad_rows_to_multiple)
        self.sample_rate = sample_rate
        self.segment = segment
        self.segment_len = int(segment * sample_rate) if segment >= 0 else -1
        self.cv_maxlen = cv_maxlen
        if cv_skip_semantics not in ("fixed", "reference"):
            raise ValueError(
                f"cv_skip_semantics must be 'fixed' or 'reference', "
                f"got {cv_skip_semantics!r}")
        self.cv_skip_semantics = cv_skip_semantics
        self.num_speakers = num_speakers
        utts = _load_infos(json_dir, num_speakers)
        if segment >= 0:
            self.plan = self._plan_segments(utts, max_hours)
        else:
            self.plan = self._plan_full(utts, max_hours)

    # -- batch planning ----------------------------------------------------
    def _plan_segments(
        self, utts: List[Utterance], max_hours: Optional[float]
    ) -> List[List[Utterance]]:
        seg, bs, sr = self.segment_len, self.batch_size, self.sample_rate
        plan: List[List[Utterance]] = []
        hours = 0.0
        start = 0
        n = len(utts)
        while start < n:
            batch: List[Utterance] = []
            num_segments = 0
            i = start
            while num_segments < bs and i < n:
                u = utts[i]
                if u.num_samples >= seg:  # drop short utts (src/data.py:89)
                    add = math.ceil(u.num_samples / seg)
                    if num_segments + add > bs and batch:
                        break  # utterance spills into the next batch
                    batch.append(u)
                    num_segments += add
                    hours += min(u.num_samples, seg * bs) / sr / 3600
                i += 1
            if batch:
                plan.append(batch)
            if i >= n:
                break
            if max_hours is not None and hours > max_hours:
                break
            start = i
        return plan

    def _plan_full(
        self, utts: List[Utterance], max_hours: Optional[float]
    ) -> List[List[Utterance]]:
        bs, sr = self.batch_size, self.sample_rate
        maxlen = self.cv_maxlen * sr  # may be inf (evaluate: no length cap)
        plan: List[List[Utterance]] = []
        hours = 0.0
        start = 0
        n = len(utts)
        while start < n:
            # Skip over-long utterances to bound memory (src/data.py:126).
            # Default ("fixed"): skip one utterance at a time — the better
            # behavior. "reference" reproduces src/data.py:124-128 exactly:
            # a too-long window *head* discards the whole batch_size window,
            # including compliant utterances sharing it — needed when
            # matching the published 15.5 dB run bit-for-bit on what cv
            # data is seen (SURVEY §7 hard part (a)).
            if utts[start].num_samples > maxlen:
                start = (min(n, start + bs)
                         if self.cv_skip_semantics == "reference"
                         else start + 1)
                continue
            end = min(n, start + bs)
            hours += utts[start].num_samples / sr / 3600
            plan.append(utts[start:end])
            if max_hours is not None and hours > max_hours:
                break
            start = end
        return plan

    def __len__(self) -> int:
        return len(self.plan)

    def batch_shapes(self, pad_to_multiple: int = 1):
        """Distinct ``[rows, T]`` mixture shapes this plan will materialize,
        computed from the manifest alone (no audio decode). Mirrors
        ``load_batch``'s padding exactly; used to AOT-probe/compile every
        shape once at solver startup instead of inside the epoch loop."""
        m = self.pad_rows_to_multiple
        if self.segment_len >= 0:
            if not self.plan:
                return []
            rows = ((self.batch_size + m - 1) // m) * m
            return [(rows, self.segment_len)]
        shapes = set()
        for utts in self.plan:
            rows = ((len(utts) + m - 1) // m) * m
            maxT = max(u.num_samples for u in utts)
            maxT = ((maxT + pad_to_multiple - 1)
                    // pad_to_multiple) * pad_to_multiple
            shapes.add((rows, maxT))
        return sorted(shapes)

    # -- materialization ---------------------------------------------------
    def load_batch(self, index: int, pad_to_multiple: int = 1) -> Batch:
        """Decode one planned batch into fixed-shape arrays.

        Training mode: every row is exactly ``segment_len`` samples; rows are
        the reference's segment slicing (full strides + re-anchored tail,
        ``src/data.py:287-296``), padded with zero-weight rows to
        ``batch_size``.
        Full-utterance mode: rows are whole utterances zero-padded to the
        batch max (rounded up to ``pad_to_multiple``).
        """
        utts = self.plan[index]
        C = self.num_speakers
        mixes: List[np.ndarray] = []
        sources: List[np.ndarray] = []
        if self.segment_len >= 0:
            seg, bs = self.segment_len, self.batch_size
            for u in utts:
                waves = load_waves(u.paths, self.sample_rate, u.num_samples)
                mix, srcs = waves[0], np.stack(waves[1:], axis=0)  # [C, T]
                T = mix.shape[-1]
                max_index = min(T - seg + 1, (bs - 1) * seg + 1)
                for s in range(0, max_index, seg):
                    mixes.append(mix[s : s + seg])
                    sources.append(srcs[:, s : s + seg])
                if T % seg != 0 and T < bs * seg:
                    mixes.append(mix[-seg:])
                    sources.append(srcs[:, -seg:])
            B = len(mixes)
            assert B <= bs, (B, bs)
            m = self.pad_rows_to_multiple
            rows = ((bs + m - 1) // m) * m
            mixture = np.zeros((rows, seg), np.float32)
            src_arr = np.zeros((rows, C, seg), np.float32)
            lengths = np.full((rows,), seg, np.int32)
            weights = np.zeros((rows,), np.float32)
            for b in range(B):
                mixture[b] = mixes[b]
                src_arr[b] = sources[b]
                weights[b] = 1.0
            return Batch(mixture, lengths, src_arr, weights)

        # full-utterance mode
        for u in utts:
            waves = load_waves(u.paths, self.sample_rate, u.num_samples)
            mixes.append(waves[0])
            sources.append(np.stack(waves[1:], axis=0))
        B = len(mixes)
        m = self.pad_rows_to_multiple
        rows = ((B + m - 1) // m) * m
        maxT = max(mx.shape[-1] for mx in mixes)
        maxT = ((maxT + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
        mixture = np.zeros((rows, maxT), np.float32)
        src_arr = np.zeros((rows, C, maxT), np.float32)
        # padding rows keep a nonzero length to avoid 0-division in the loss;
        # their weight is 0 so they contribute nothing
        lengths = np.full((rows,), maxT, np.int32)
        weights = np.zeros((rows,), np.float32)
        for b in range(B):
            T = mixes[b].shape[-1]
            mixture[b, :T] = mixes[b]
            src_arr[b, :, :T] = sources[b]
            lengths[b] = T
            weights[b] = 1.0
        return Batch(mixture, lengths, src_arr, weights)


class EvalDataset:
    """Mixture-only dataset for separation (parity: ``EvalDataset``,
    ``src/data.py:190-260``): batches of ``batch_size`` length-sorted
    mixtures, optionally auto-building the manifest from a directory."""

    def __init__(
        self,
        mix_dir: Optional[str] = None,
        mix_json: Optional[str] = None,
        batch_size: int = 1,
        sample_rate: int = 8000,
    ):
        assert mix_dir is not None or mix_json is not None
        if mix_dir is not None:
            from convtasnet_tpu.data.manifest import build_manifest

            mix_json = build_manifest(mix_dir, mix_dir, "mix", sample_rate)
        with open(mix_json) as f:
            infos = json.load(f)
        infos.sort(key=lambda r: int(r[1]), reverse=True)
        self.sample_rate = sample_rate
        self.plan = [
            infos[i : i + batch_size] for i in range(0, len(infos), batch_size)
        ]

    def __len__(self) -> int:
        return len(self.plan)

    def load_batch(self, index: int, pad_to_multiple: int = 1):
        """-> (mixture [B, T], lengths [B], filenames)."""
        rows = self.plan[index]
        waves = [read_wav(r[0], self.sample_rate)[0] for r in rows]
        maxT = max(w.shape[-1] for w in waves)
        maxT = ((maxT + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
        mixture = np.zeros((len(waves), maxT), np.float32)
        lengths = np.zeros((len(waves),), np.int32)
        for b, w in enumerate(waves):
            mixture[b, : w.shape[-1]] = w
            lengths[b] = w.shape[-1]
        return mixture, lengths, [r[0] for r in rows]
