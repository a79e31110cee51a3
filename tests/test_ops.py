"""Unit tests for framing / overlap-add / norms / convs.

Numerics are cross-checked against independent torch implementations of the
same math (torch's own conv/var ops — not reference code) per SURVEY §4's
test plan."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from convtasnet_tpu.ops.frames import frame_signal, num_frames, overlap_and_add
from convtasnet_tpu.ops.norm import channelwise_layer_norm, global_layer_norm
from convtasnet_tpu.ops.conv import depthwise_conv1d, pointwise_conv, prelu


def test_frame_signal_matches_strided_conv():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 32000)).astype(np.float32)
    L, hop = 20, 10
    frames = np.asarray(frame_signal(jnp.asarray(x), L, hop))
    K = num_frames(32000, L, hop)
    assert frames.shape == (3, K, L)
    assert K == 2 * 32000 // L - 1  # reference's K formula, src/conv_tasnet.py:113
    # strided unfold ground truth
    t = torch.from_numpy(x).unfold(-1, L, hop).numpy()
    np.testing.assert_allclose(frames, t, rtol=0, atol=0)


@pytest.mark.parametrize("L,hop", [(20, 10), (16, 8), (40, 20), (12, 4), (15, 10), (9, 6)])
def test_overlap_and_add_matches_fold(L, hop):
    rng = np.random.default_rng(1)
    K = 37
    sig = rng.standard_normal((2, 3, K, L)).astype(np.float32)
    out = np.asarray(overlap_and_add(jnp.asarray(sig), hop))
    out_size = (K - 1) * hop + L
    assert out.shape == (2, 3, out_size)
    # torch.nn.functional.fold ground truth
    t = torch.from_numpy(sig).reshape(6, K, L).transpose(1, 2)  # [6, L, K]
    folded = F.fold(t, (1, out_size), (1, L), stride=(1, hop)).reshape(2, 3, out_size)
    np.testing.assert_allclose(out, folded.numpy(), rtol=1e-6, atol=1e-5)


def test_ola_inverts_framing_with_window_compensation():
    # With 50% overlap and unit frames, OLA(frame(x)) == 2*x in the interior.
    x = jnp.asarray(np.random.default_rng(2).standard_normal(4000).astype(np.float32))
    L, hop = 20, 10
    frames = frame_signal(x, L, hop)
    rec = overlap_and_add(frames, hop)
    np.testing.assert_allclose(np.asarray(rec[hop:-hop]), 2 * np.asarray(x[hop:-hop]), rtol=1e-5, atol=1e-5)


def test_cln_matches_torch_channelwise():
    # Reference cLN: stats over channel dim at each timestep (src/conv_tasnet.py:332-334).
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 50, 16)).astype(np.float32)  # [M, K, N] channels-last
    gamma = rng.standard_normal(16).astype(np.float32)
    beta = rng.standard_normal(16).astype(np.float32)
    got = np.asarray(channelwise_layer_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))
    xt = torch.from_numpy(x).permute(0, 2, 1)  # [M, N, K] channels-first
    mean = xt.mean(dim=1, keepdim=True)
    var = xt.var(dim=1, keepdim=True, unbiased=False)
    want = (torch.from_numpy(gamma)[None, :, None] * (xt - mean) / (var + 1e-8) ** 0.5
            + torch.from_numpy(beta)[None, :, None])
    np.testing.assert_allclose(got, want.permute(0, 2, 1).numpy(), rtol=1e-4, atol=1e-5)


def test_gln_matches_torch_global():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 50, 16)).astype(np.float32)
    gamma = rng.standard_normal(16).astype(np.float32)
    beta = rng.standard_normal(16).astype(np.float32)
    got = np.asarray(global_layer_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))
    xt = torch.from_numpy(x).permute(0, 2, 1)
    mean = xt.mean(dim=(1, 2), keepdim=True)
    var = ((xt - mean) ** 2).mean(dim=(1, 2), keepdim=True)
    want = (torch.from_numpy(gamma)[None, :, None] * (xt - mean) / (var + 1e-8) ** 0.5
            + torch.from_numpy(beta)[None, :, None])
    np.testing.assert_allclose(got, want.permute(0, 2, 1).numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dilation,causal", [(1, False), (2, False), (8, False), (1, True), (4, True), (128, False), (128, True)])
def test_depthwise_conv_matches_torch(dilation, causal):
    rng = np.random.default_rng(5)
    Kt, H, P = 300, 8, 3
    x = rng.standard_normal((2, Kt, H)).astype(np.float32)
    w = rng.standard_normal((P, H)).astype(np.float32)
    got = np.asarray(depthwise_conv1d(jnp.asarray(x), jnp.asarray(w), dilation, causal))
    # torch ground truth: grouped conv, channels-first, pad per reference semantics
    xt = torch.from_numpy(x).permute(0, 2, 1)  # [M, H, K]
    wt = torch.from_numpy(w).permute(1, 0).reshape(H, 1, P)  # [H, 1, P]
    padding = (P - 1) * dilation if causal else (P - 1) * dilation // 2
    y = F.conv1d(xt, wt, padding=padding, dilation=dilation, groups=H)
    if causal:
        y = y[:, :, : -padding]  # chomp (src/conv_tasnet.py:295)
    np.testing.assert_allclose(got, y.permute(0, 2, 1).numpy(), rtol=1e-4, atol=1e-4)


def test_pointwise_conv_and_prelu():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 10, 8)).astype(np.float32)
    w = rng.standard_normal((8, 4)).astype(np.float32)
    got = np.asarray(pointwise_conv(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, x @ w, rtol=1e-5, atol=1e-5)
    a = 0.25
    got_p = np.asarray(prelu(jnp.asarray(x), jnp.asarray(a)))
    want_p = F.prelu(torch.from_numpy(x), torch.tensor([a])).numpy()
    np.testing.assert_allclose(got_p, want_p, rtol=1e-6, atol=1e-6)
