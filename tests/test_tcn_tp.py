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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.parametrize("variant", [None, "t16"])
def test_tp_stage2_ad_grads_match_autodiff(variant):
    """The custom-VJP pair (fused or XLA forward + remat backward) matches
    plain autodiff of the XLA stage 2 on every cotangent."""
    from convtasnet_tpu.ops.pallas.tcn_block_tp import tp_stage2_ad

    rng = np.random.default_rng(3)
    M, K, Hs, B, P_, d = 2, 37, 8, 6, 3, 2
    h = jnp.asarray(rng.standard_normal((M, K, Hs)), jnp.float32)
    stats1 = jnp.asarray(
        np.stack([rng.standard_normal(M) * 0.1,
                  1.0 + 0.2 * rng.random(M)], -1), jnp.float32)
    dw = jnp.asarray(rng.standard_normal((P_, Hs)) / np.sqrt(P_), jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((Hs, B)) / np.sqrt(Hs),
                        jnp.float32)
    a2 = jnp.float32(0.25)
    g1 = jnp.asarray(rng.standard_normal((Hs,)) * 0.1 + 1.0, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((Hs,)) * 0.1, jnp.float32)
    g2 = jnp.asarray(rng.standard_normal((Hs,)) * 0.1 + 1.0, jnp.float32)
    args = (h, stats1, dw, w_out, a2, g1, b1, g2)
    argnums = tuple(range(8))

    def loss_pair(*a):
        z, s = tp_stage2_ad((d, False, variant, True), *a)
        return jnp.sum(z * z) + jnp.sum(s)

    def loss_ref(*a):
        z, s = xla_tp_stage2(*a, dilation=d, causal=False)
        return jnp.sum(z * z) + jnp.sum(s)

    got = jax.grad(loss_pair, argnums=argnums)(*args)
    want = jax.grad(loss_ref, argnums=argnums)(*args)
    for g_, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w_),
                                   rtol=2e-4, atol=2e-5)


def _tiny_batch(cfg, M=4, T=1600, seed=7):
    rng = np.random.default_rng(seed)
    mixture = jnp.asarray(rng.standard_normal((M, T)), jnp.float32)
    sources = jnp.asarray(
        rng.standard_normal((M, cfg.num_speakers, T)), jnp.float32)
    lengths = jnp.full((M,), T, jnp.int32)
    weights = jnp.ones((M,), jnp.float32)
    return (mixture, lengths, sources, weights)


@pytest.mark.parametrize("norm_type", ["gLN", "cLN"])
def test_tp_train_step_matches_baseline(norm_type):
    """One make_tcn_tp_train_step step on a (2 data x 4 model) mesh equals
    the plain make_train_step from the same init: loss, grad_norm, and the
    updated params. gLN runs the stage-split body (custom-VJP plumbing;
    fused never engages under vma on CPU), cLN the generic per-norm body
    (exercising the static element-count under vma checking)."""
    from convtasnet_tpu.config import SolverConfig
    from convtasnet_tpu.parallel.tensor_parallel import (
        make_tcn_tp_train_step,
    )
    from convtasnet_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    cfg = ConvTasNetConfig(**TINY, norm_type=norm_type, use_pallas=False)
    scfg = SolverConfig(lr=1e-3)
    T = 1600
    state, tx = create_train_state(cfg, scfg, jax.random.PRNGKey(0), T)
    batch = _tiny_batch(cfg, M=4, T=T)

    base_step = make_train_step(cfg, tx, donate=False)
    ref_state, ref_metrics = base_step(state, batch)

    mesh = make_mesh(n_data=2, n_model=4)
    tp_step = make_tcn_tp_train_step(cfg, tx, mesh, donate=False)
    tp_state, tp_metrics = tp_step(state, batch)

    np.testing.assert_allclose(float(tp_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(tp_metrics["grad_norm"]),
                               float(ref_metrics["grad_norm"]), rtol=1e-4)
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
    tp_leaves = jax.tree_util.tree_leaves(tp_state.params)
    for r_, t_ in zip(ref_leaves, tp_leaves):
        np.testing.assert_allclose(np.asarray(t_), np.asarray(r_),
                                   rtol=5e-4, atol=5e-6)


def test_tp_train_step_multi_scans(monkeypatch):
    """The .multi variant scans several optimizer steps per dispatch and
    advances the step counter."""
    from convtasnet_tpu.config import SolverConfig
    from convtasnet_tpu.parallel.tensor_parallel import (
        make_tcn_tp_train_step,
    )
    from convtasnet_tpu.train.train_step import create_train_state

    cfg = ConvTasNetConfig(**TINY, norm_type="gLN", use_pallas=False)
    state, tx = create_train_state(cfg, SolverConfig(), jax.random.PRNGKey(0),
                                   1600)
    mesh = make_mesh(n_data=2, n_model=4)
    step = make_tcn_tp_train_step(cfg, tx, mesh, donate=False)
    b = _tiny_batch(cfg, M=2, T=1600)
    batches = jax.tree_util.tree_map(
        lambda x: jnp.stack([x, x]), b)
    new_state, metrics = step.multi(state, batches)
    assert int(new_state.step) == 2
    assert metrics["loss"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))


def test_tp_train_step_rejects_bn():
    from convtasnet_tpu.config import SolverConfig
    from convtasnet_tpu.parallel.tensor_parallel import (
        make_tcn_tp_train_step,
    )
    from convtasnet_tpu.train.train_step import create_train_state

    cfg = ConvTasNetConfig(**TINY, norm_type="BN", use_pallas=False)
    _, tx = create_train_state(cfg, SolverConfig(), jax.random.PRNGKey(0),
                               1600)
    mesh = make_mesh(n_data=2, n_model=4)
    with pytest.raises(ValueError, match="BN"):
        make_tcn_tp_train_step(cfg, tx, mesh)
