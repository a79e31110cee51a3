"""Utterance-level permutation-invariant SI-SNR objective (uPIT).

Capability parity with the reference loss (``src/pit_criterion.py:12-114``):
zero-mean over true (unpadded) lengths, pairwise CxC SI-SNR matrix by
broadcasting, C! permutation search via a one-hot einsum, loss =
-mean(max-over-perms SI-SNR / C).

TPU-first differences from the reference:

- ``reorder_source`` / ``length_mask`` are gathers / broadcast compares
  instead of Python B×C loops (``src/pit_criterion.py:95-98,110-113``) —
  everything here is jit-traceable with static shapes.
- no in-place mutation of the caller's tensor (the reference clobbers
  ``estimate_source`` via ``*= mask``, ``src/pit_criterion.py:38`` — a known
  quirk we do not copy).
- the permutation one-hot tensor is a compile-time constant.

All math in float32 regardless of model compute dtype.
"""

from __future__ import annotations

from itertools import permutations
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-8


def _perm_one_hots(C: int) -> np.ndarray:
    """[C!, C, C] one-hot permutation matrices, a static constant."""
    perms = np.array(list(permutations(range(C))), dtype=np.int32)  # [C!, C]
    one_hot = np.zeros((perms.shape[0], C, C), dtype=np.float32)
    one_hot[np.arange(perms.shape[0])[:, None], np.arange(C)[None, :], perms] = 1.0
    return one_hot, perms


def length_mask(lengths: jax.Array, T: int) -> jax.Array:
    """[B] lengths -> [B, 1, T] {0,1} float mask (parity: ``get_mask``)."""
    t = jnp.arange(T)[None, :]
    return (t < lengths[:, None]).astype(jnp.float32)[:, None, :]


def pit_si_snr(
    source: jax.Array, estimate: jax.Array, lengths: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Max-over-permutations SI-SNR.

    Args:
        source: [B, C, T] reference sources (zero-padded beyond ``lengths``).
        estimate: [B, C, T] estimated sources.
        lengths: [B] true sample counts.

    Returns:
        (max_snr [B], best_perm [B, C]) — ``max_snr`` is the mean-over-speakers
        SI-SNR under the best permutation; ``best_perm[b, c]`` gives which
        estimate channel plays reference channel c's best-matching role
        (identical contract to the reference's ``perms[max_snr_idx]``).
    """
    source = source.astype(jnp.float32)
    estimate = estimate.astype(jnp.float32)
    B, C, T = source.shape
    mask = length_mask(lengths, T)  # [B, 1, T]
    estimate = estimate * mask

    num = lengths.astype(jnp.float32)[:, None, None]  # [B, 1, 1]
    zm_target = (source - jnp.sum(source, axis=2, keepdims=True) / num) * mask
    zm_estimate = (estimate - jnp.sum(estimate, axis=2, keepdims=True) / num) * mask

    # Pairwise projections: s_estimate [B, C, 1, T] vs s_target [B, 1, C, T].
    s_target = zm_target[:, None, :, :]
    s_estimate = zm_estimate[:, :, None, :]
    pair_dot = jnp.sum(s_estimate * s_target, axis=3, keepdims=True)  # [B,C,C,1]
    target_energy = jnp.sum(s_target ** 2, axis=3, keepdims=True) + EPS
    proj = pair_dot * s_target / target_energy  # [B, C, C, T]
    noise = s_estimate - proj
    ratio = jnp.sum(proj ** 2, axis=3) / (jnp.sum(noise ** 2, axis=3) + EPS)
    pair_si_snr = 10.0 * jnp.log10(ratio + EPS)  # [B, C, C] (est i, ref j)

    one_hot, perms = _perm_one_hots(C)
    snr_set = jnp.einsum("bij,pij->bp", pair_si_snr, jnp.asarray(one_hot))
    best_idx = jnp.argmax(snr_set, axis=1)  # [B]
    max_snr = jnp.max(snr_set, axis=1) / C  # [B]
    best_perm = jnp.asarray(perms)[best_idx]  # [B, C]
    return max_snr, best_perm


def reorder_source(source: jax.Array, best_perm: jax.Array) -> jax.Array:
    """Align estimates to reference channels: out[b, c] = source[b, inv_perm[b, c]].

    ``best_perm[b, i] = j`` means estimate channel i matches reference channel
    j, so reference channel c is played by estimate ``inv_perm[c]``.
    Gather-based (no loops); parity with ``reorder_source``
    (``src/pit_criterion.py:80-99``) — except the reference indexes with the
    *forward* permutation, which is only correct for involutions (always true
    at C=2 but wrong for 3-cycles at C>=3); we use the inverse.
    """
    inv_perm = jnp.argsort(best_perm, axis=1)
    return jnp.take_along_axis(source, inv_perm[:, :, None], axis=1)


def si_snr_single(reference: jax.Array, estimate: jax.Array) -> jax.Array:
    """Plain (non-PIT) SI-SNR of one pair of [..., T] signals, zero-mean over
    the full length. Used by evaluation (parity: ``src/evaluate.py:113-130``)."""
    reference = reference.astype(jnp.float32)
    estimate = estimate.astype(jnp.float32)
    ref_zm = reference - jnp.mean(reference, axis=-1, keepdims=True)
    est_zm = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
    proj = (
        jnp.sum(ref_zm * est_zm, axis=-1, keepdims=True)
        * ref_zm
        / (jnp.sum(ref_zm ** 2, axis=-1, keepdims=True) + EPS)
    )
    noise = est_zm - proj
    return 10.0 * jnp.log10(
        (jnp.sum(proj ** 2, axis=-1) + EPS) / (jnp.sum(noise ** 2, axis=-1) + EPS)
    )


def cal_loss(
    source: jax.Array, estimate: jax.Array, lengths: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Loss = -mean(max-over-perms SI-SNR). Returns (loss, max_snr [B],
    reordered_estimate [B, C, T]) — same information as the reference's
    ``cal_loss`` (``src/pit_criterion.py:12-24``) minus the redundant
    pass-through of the (mutated) input."""
    max_snr, best_perm = pit_si_snr(source, estimate, lengths)
    loss = -jnp.mean(max_snr)
    reordered = reorder_source(estimate, best_perm)
    return loss, max_snr, reordered
