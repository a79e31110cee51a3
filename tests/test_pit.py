"""PIT SI-SNR loss tests: hand-computable cases, padding/masking behavior, and
a cross-check against an independent torch oracle built from the published
uPIT SI-SNR definition."""

from itertools import permutations

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from convtasnet_tpu.losses.pit import (
    cal_loss,
    length_mask,
    pit_si_snr,
    reorder_source,
    si_snr_single,
)

EPS = 1e-8


def torch_pit_oracle(source, estimate, lengths):
    """Brute-force uPIT SI-SNR in torch: for every permutation, compute the
    mean SI-SNR and take the max. Independent of both implementations."""
    B, C, T = source.shape
    src = torch.from_numpy(source).double()
    est = torch.from_numpy(estimate).double()
    best = []
    best_perm = []
    for b in range(B):
        n = lengths[b]
        scores = []
        for perm in permutations(range(C)):
            vals = []
            for i, j in enumerate(perm):  # estimate i vs reference j
                s = src[b, j, :n] - src[b, j, :n].mean()
                e = est[b, i, :n] - est[b, i, :n].mean()
                proj = (torch.dot(e, s) * s) / (torch.dot(s, s) + EPS)
                noise = e - proj
                vals.append(10 * torch.log10(
                    torch.dot(proj, proj) / (torch.dot(noise, noise) + EPS) + EPS))
            scores.append(torch.stack(vals).mean())
        scores = torch.stack(scores)
        best.append(scores.max().item())
        best_perm.append(list(permutations(range(C)))[scores.argmax().item()])
    return np.array(best), best_perm


def test_perfect_separation_gives_high_snr():
    rng = np.random.default_rng(0)
    src = rng.standard_normal((2, 2, 4000)).astype(np.float32)
    lengths = jnp.asarray([4000, 4000])
    max_snr, perm = pit_si_snr(jnp.asarray(src), jnp.asarray(src), lengths)
    assert np.all(np.asarray(max_snr) > 60.0)  # near-identical -> huge SNR
    np.testing.assert_array_equal(np.asarray(perm), [[0, 1], [0, 1]])


def test_swapped_channels_found_by_pit():
    rng = np.random.default_rng(1)
    src = rng.standard_normal((1, 2, 4000)).astype(np.float32)
    est = src[:, ::-1, :].copy()
    max_snr, perm = pit_si_snr(jnp.asarray(src), jnp.asarray(est), jnp.asarray([4000]))
    assert np.asarray(max_snr)[0] > 60.0
    np.testing.assert_array_equal(np.asarray(perm)[0], [1, 0])
    # reorder must align the estimate back to reference channel order
    re = np.asarray(reorder_source(jnp.asarray(est), perm))
    np.testing.assert_allclose(re, src, atol=0)


@pytest.mark.parametrize("C", [2, 3])
def test_matches_bruteforce_oracle(C):
    rng = np.random.default_rng(2)
    B, T = 3, 2000
    src = rng.standard_normal((B, C, T)).astype(np.float32)
    est = (0.8 * src[:, rng.permutation(C), :] +
           0.3 * rng.standard_normal((B, C, T))).astype(np.float32)
    lengths = np.array([T, T - 137, T - 523])
    src_masked = src.copy()
    est_masked = est.copy()
    for b in range(B):
        src_masked[b, :, lengths[b]:] = 0
    want, want_perms = torch_pit_oracle(src_masked, est_masked, lengths)
    got, got_perm = pit_si_snr(
        jnp.asarray(src_masked), jnp.asarray(est_masked), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    for b in range(B):
        assert tuple(np.asarray(got_perm)[b]) == want_perms[b]


def test_reorder_inverse_for_three_speakers():
    # A 3-cycle: estimate channel i contains reference source (i+1) % 3.
    rng = np.random.default_rng(3)
    src = rng.standard_normal((1, 3, 1000)).astype(np.float32)
    est = np.stack([src[0, 1], src[0, 2], src[0, 0]])[None]
    _, perm = pit_si_snr(jnp.asarray(src), jnp.asarray(est), jnp.asarray([1000]))
    re = np.asarray(reorder_source(jnp.asarray(est), perm))
    np.testing.assert_allclose(re, src, atol=1e-6)


def test_padding_is_ignored():
    rng = np.random.default_rng(4)
    T, n = 3000, 2400
    src = rng.standard_normal((1, 2, T)).astype(np.float32)
    est = (src + 0.1 * rng.standard_normal((1, 2, T))).astype(np.float32)
    src[:, :, n:] = 0
    # garbage in the padded region of the estimate must not change the loss
    est_clean = est.copy(); est_clean[:, :, n:] = 0
    est_dirty = est.copy(); est_dirty[:, :, n:] = 100.0
    l1, *_ = cal_loss(jnp.asarray(src), jnp.asarray(est_clean), jnp.asarray([n]))
    l2, *_ = cal_loss(jnp.asarray(src), jnp.asarray(est_dirty), jnp.asarray([n]))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_length_mask():
    m = np.asarray(length_mask(jnp.asarray([3, 5]), 6))
    assert m.shape == (2, 1, 6)
    np.testing.assert_array_equal(m[0, 0], [1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(m[1, 0], [1, 1, 1, 1, 1, 0])


def test_si_snr_single_scale_invariance():
    rng = np.random.default_rng(5)
    ref = rng.standard_normal(4000).astype(np.float32)
    est = 0.9 * ref + 0.05 * rng.standard_normal(4000).astype(np.float32)
    a = float(si_snr_single(jnp.asarray(ref), jnp.asarray(est)))
    b = float(si_snr_single(jnp.asarray(ref), jnp.asarray(3.7 * est)))
    np.testing.assert_allclose(a, b, rtol=1e-4)
