"""Signal framing and overlap-add, formulated for XLA/TPU.

The reference implements the encoder's framing implicitly as a strided
``nn.Conv1d`` (``src/conv_tasnet.py:106``) and overlap-add via a
gcd-subframe view plus ``index_add_`` scatter (``src/utils.py:9-47``).
Scatter-adds map poorly onto the TPU; here both directions are expressed as
reshapes plus a small static number of shifted adds, which XLA fuses into
pure vector code:

- ``frame_signal``: when ``frame_length % frame_step == 0`` (the Conv-TasNet
  default, L=20 / hop=10), framing is a ``[T] -> [T//hop, hop]`` reshape
  followed by ``q = L//hop`` shifted concatenations.
- ``overlap_and_add``: the exact adjoint — split frames into ``q`` subframes
  and accumulate ``q`` shifted copies.

A gcd-subframe fallback covers arbitrary (length, step) pairs, matching the
reference's general ``overlap_and_add`` contract
(``output_size = (frames-1)*step + length``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def num_frames(num_samples: int, frame_length: int, frame_step: int) -> int:
    """Number of full frames, matching conv1d semantics: (T - L)//hop + 1.

    For L = 2*hop this is the reference's K = 2T/L - 1 (``src/conv_tasnet.py:113``).
    """
    return (num_samples - frame_length) // frame_step + 1


def frame_signal(x: jax.Array, frame_length: int, frame_step: int) -> jax.Array:
    """Frame a signal ``[..., T]`` into ``[..., K, frame_length]``.

    K = (T - frame_length)//frame_step + 1; trailing samples that do not fill
    a frame are dropped (same as a VALID strided conv).
    """
    T = x.shape[-1]
    K = num_frames(T, frame_length, frame_step)
    if K <= 0:
        raise ValueError(f"signal length {T} shorter than frame length {frame_length}")
    if frame_length % frame_step == 0:
        q = frame_length // frame_step
        # [..., T] -> [..., T//step, step] subframe view, then q shifted slices.
        n_sub = T // frame_step
        sub = x[..., : n_sub * frame_step].reshape(*x.shape[:-1], n_sub, frame_step)
        parts = [sub[..., i : i + K, :] for i in range(q)]
        return jnp.concatenate(parts, axis=-1)
    # General strided gather (rare path: L not a multiple of hop).
    starts = jnp.arange(K) * frame_step
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return x[..., idx]


def overlap_and_add(frames: jax.Array, frame_step: int) -> jax.Array:
    """Overlap-add frames ``[..., K, L]`` at hop ``frame_step`` -> ``[..., Tout]``.

    ``Tout = (K-1)*frame_step + L``, identical to the reference contract
    (``src/utils.py:16``). Implemented as shifted adds instead of scatter.
    """
    *outer, K, L = frames.shape
    if frame_step > L:
        raise ValueError(f"frame_step {frame_step} > frame_length {L}")
    out_size = (K - 1) * frame_step + L

    if L % frame_step == 0:
        q = L // frame_step
        # [..., K, L] -> [..., K, q, step]; output subframe j receives
        # frames[j - i, i] for each shift i < q.
        sub = frames.reshape(*outer, K, q, frame_step)
        n_out_sub = out_size // frame_step  # == K - 1 + q
        out = jnp.zeros((*outer, n_out_sub, frame_step), frames.dtype)
        for i in range(q):
            out = out.at[..., i : i + K, :].add(sub[..., :, i, :])
        return out.reshape(*outer, out_size)

    # gcd-subframe fallback (arbitrary L/step), segment-sum over static ids.
    g = math.gcd(L, frame_step)
    sub_per_frame = L // g
    sub_step = frame_step // g
    n_out_sub = out_size // g
    sub = frames.reshape(*outer, K * sub_per_frame, g)
    # subframe s of frame k lands at output subframe k*sub_step + s
    ids = (jnp.arange(K)[:, None] * sub_step + jnp.arange(sub_per_frame)[None, :]).reshape(-1)
    flat = sub.reshape(-1, K * sub_per_frame, g)
    out = jax.vmap(
        lambda f: jax.ops.segment_sum(f, ids, num_segments=n_out_sub)
    )(flat)
    return out.reshape(*outer, out_size)
