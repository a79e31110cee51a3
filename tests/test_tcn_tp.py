"""Fused TCN block under tensor parallelism (ops/pallas/tcn_block_tp).

Covers: the stage-split decomposition's math against the unfused block, the
Pallas stage-2 kernel (interpret mode) against the XLA stage 2, the full
tp_forward gLN path with the fused kernel engaged inside the shard_map on a
virtual (data, model) mesh, and the trace-time probe gate.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params
from convtasnet_tpu.ops.pallas.tcn_block import _xla_block
from convtasnet_tpu.ops.pallas.tcn_block_tp import (
    fused_tp_stage2,
    stats_from_sums,
    tcn_tp_ready,
    tp_epilogue,
    tp_stage1,
    tp_variant_params,
    xla_tp_stage2,
)
from convtasnet_tpu.parallel.mesh import make_mesh
from convtasnet_tpu.parallel.tensor_parallel import tp_forward

TINY = dict(n_filters=16, kernel_size=8, bottleneck=12, hidden=32,
            conv_kernel=3, num_blocks=3, num_repeats=2, num_speakers=2)


def _rand_block(rng, K, B, H, P, M=2):
    x = jnp.asarray(rng.standard_normal((M, K, B)), jnp.float32)
    w_in = jnp.asarray(rng.standard_normal((B, H)) / np.sqrt(B), jnp.float32)
    dw = jnp.asarray(rng.standard_normal((P, H)) / np.sqrt(P), jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((H, B)) / np.sqrt(H), jnp.float32)
    a1, a2 = jnp.float32(0.25), jnp.float32(0.1)
    g1 = jnp.asarray(rng.standard_normal((H,)) * 0.1 + 1.0, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((H,)) * 0.1, jnp.float32)
    g2 = jnp.asarray(rng.standard_normal((H,)) * 0.1 + 1.0, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((H,)) * 0.1, jnp.float32)
    return x, w_in, dw, w_out, a1, a2, g1, b1, g2, b2


@pytest.mark.parametrize("dilation,causal", [(1, False), (2, False),
                                             (4, False), (2, True)])
def test_decomposition_matches_unfused_block(dilation, causal):
    """stage1 -> stats -> XLA stage2 -> epilogue (identity psum, one shard
    = full width) reproduces the unfused gLN block exactly."""
    rng = np.random.default_rng(0)
    K, B, H, P = 50, 12, 32, 3
    x, w_in, dw, w_out, a1, a2, g1, b1, g2, b2 = _rand_block(rng, K, B, H, P)

    h, sums1 = tp_stage1(x, w_in, a1)
    stats1 = stats_from_sums(sums1, K * H)
    z, sums2 = xla_tp_stage2(h, stats1, dw, w_out, a2, g1, b1, g2,
                             dilation=dilation, causal=causal)
    w1 = jnp.einsum("h,hb->b", g2, w_out)
    w0 = jnp.einsum("h,hb->b", b2, w_out)
    got = tp_epilogue(x, z, stats_from_sums(sums2, K * H), w1, w0)

    zeros, ones = jnp.zeros((H,)), jnp.ones((H,))
    want = _xla_block((dilation, causal, "gLN"), x, w_in, dw, w_out, a1, a2,
                      g1, b1, g2, b2, zeros, ones, zeros, ones)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dilation,causal,K", [(1, False, 37), (2, False, 48),
                                               (4, True, 37), (8, False, 16)])
def test_stage2_fused_matches_xla_interpret(dilation, causal, K):
    """The Pallas stage-2 kernel (interpret mode, boundary tiles + halo
    fill + stat masking) matches the XLA stage 2 on z AND the sums."""
    rng = np.random.default_rng(1)
    M, Hs, B, P = 2, 8, 6, 3
    h = jnp.asarray(rng.standard_normal((M, K, Hs)), jnp.float32)
    stats1 = jnp.asarray(
        np.stack([rng.standard_normal(M) * 0.1,
                  1.0 + 0.2 * rng.random(M)], -1), jnp.float32)
    dw = jnp.asarray(rng.standard_normal((P, Hs)) / np.sqrt(P), jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((Hs, B)) / np.sqrt(Hs),
                        jnp.float32)
    a2 = jnp.float32(0.25)
    g1 = jnp.asarray(rng.standard_normal((Hs,)) * 0.1 + 1.0, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((Hs,)) * 0.1, jnp.float32)
    g2 = jnp.asarray(rng.standard_normal((Hs,)) * 0.1 + 1.0, jnp.float32)

    z_ref, s_ref = xla_tp_stage2(h, stats1, dw, w_out, a2, g1, b1, g2,
                                 dilation=dilation, causal=causal)
    z, s = fused_tp_stage2(h, stats1, dw, w_out, a2, g1, b1, g2,
                           dilation=dilation, causal=causal, tile=16,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=2e-5, atol=2e-5)


def test_tp_forward_gln_fused_interpret_matches_unsharded():
    """Full tp_forward with use_pallas on (CPU: interpret kernels engage
    unconditionally inside the shard_map) vs the unsharded XLA model."""
    cfg = ConvTasNetConfig(**TINY, norm_type="gLN", use_pallas=True)
    T = 1600
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    mix = jax.random.normal(jax.random.PRNGKey(1), (4, T))
    cfg_ref = dataclasses.replace(cfg, use_pallas=False)
    want = np.asarray(ConvTasNet(cfg_ref).apply(variables, mix, train=False))

    mesh = make_mesh(n_data=2, n_model=4)
    got = np.asarray(tp_forward(cfg, variables, mix, mesh))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_tp_forward_gln_xla_stage2_matches_unsharded():
    """Same decomposition with the XLA stage 2 (use_pallas off) — the
    production fallback path inside the same shard_map."""
    cfg = ConvTasNetConfig(**TINY, norm_type="gLN", use_pallas=False)
    T = 1200
    variables = init_params(cfg, jax.random.PRNGKey(2), example_len=T)
    mix = jax.random.normal(jax.random.PRNGKey(3), (2, T))
    want = np.asarray(ConvTasNet(cfg).apply(variables, mix, train=False))
    mesh = make_mesh(n_data=2, n_model=4)
    got = np.asarray(tp_forward(cfg, variables, mix, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ready_gate_and_variant_decode():
    # unprobed shapes gate to XLA on a real backend, engage in interpret
    assert tcn_tp_ready(4, 399, 128, 256, False, "float32", True) == "auto"
    assert tcn_tp_ready(4, 399, 128, 256, False, "float32", False) is None
    assert tp_variant_params(None) == (None, None)
    assert tp_variant_params("auto") == (None, None)
    assert tp_variant_params("t800") == (800, None)
    assert tp_variant_params("t1600_f32") == (1600, jnp.float32)


def test_ensure_probed_noop_on_cpu():
    from convtasnet_tpu.ops.pallas.tcn_block_tp import ensure_probed_tcn_tp

    cfg = ConvTasNetConfig(**TINY, use_pallas=True)
    ensure_probed_tcn_tp(cfg, 4, 2, 1600)  # cpu backend: returns quietly
    assert tcn_tp_ready(1, 399, 8, 12, False, "float32", False) is None
