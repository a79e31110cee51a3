"""Fused two-block pair TRAIN custom-VJP (pair forward kernel + fused pair
backward, ops/pallas/tcn_block_pair_bwd) — interpret mode on CPU.

The pair backward recomputes BOTH blocks' intermediates (and the
inter-block residual x1) in VMEM from the pair input and emits dx plus all
18 weight/affine/slope grads in one kernel; these tests pin every cotangent
against XLA autodiff of the chained block math (the backward of the
reference's hot loop, ``src/conv_tasnet.py:218-278`` under
``loss.backward()``).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convtasnet_tpu.ops.conv import depthwise_conv1d, pointwise_conv, prelu
from convtasnet_tpu.ops.norm import global_layer_norm
from convtasnet_tpu.ops.pallas import tcn_block_pair as tbp
from convtasnet_tpu.ops.pallas.tcn_block_pair import (
    fused_block_pair_train_ready,
    fused_tcn_block_pair_ad,
)
from convtasnet_tpu.ops.pallas.tcn_block_pair_bwd import (
    fused_tcn_block_pair_bwd,
)


def _xla_block(x, p9, dilation, causal):
    w_in, dw, w_out, a1, a2, g1, b1, g2, b2 = p9
    y = prelu(pointwise_conv(x, w_in), a1)
    y = global_layer_norm(y, g1, b1)
    y = prelu(depthwise_conv1d(y, dw, dilation, causal), a2)
    y = global_layer_norm(y, g2, b2)
    return x + pointwise_conv(y, w_out)


def _params9(B, H, P, seed):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(v) for v in (
        rng.standard_normal((B, H)).astype(np.float32) / np.sqrt(B),
        rng.standard_normal((P, H)).astype(np.float32) * 0.3,
        rng.standard_normal((H, B)).astype(np.float32) / np.sqrt(H),
        np.float32(0.25), np.float32(0.3),
        rng.standard_normal(H).astype(np.float32),
        rng.standard_normal(H).astype(np.float32),
        rng.standard_normal(H).astype(np.float32),
        rng.standard_normal(H).astype(np.float32),
    ))


def _all_grads(fn, x, pa, pb, cot):
    """Cotangents of sum(fn(x, pa, pb) * cot) w.r.t. x and all 18 params."""

    def loss(xx, *p18):
        return jnp.sum(fn(xx, p18[:9], p18[9:]).astype(jnp.float32) * cot)

    return jax.grad(loss, argnums=tuple(range(19)))(x, *pa, *pb)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("d1,d2", [(1, 2), (4, 8)])
def test_pair_bwd_matches_autodiff_chain(causal, d1, d2):
    """All 19 cotangents of the pair custom-VJP == XLA autodiff of the
    chained blocks (f32, K not a tile multiple, d1 != d2)."""
    M, K, B, H, P = 2, 300, 128, 256, 3
    pa = _params9(B, H, P, seed=1)
    pb = _params9(B, H, P, seed=2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((M, K, B)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((M, K, B)).astype(np.float32))

    fused = lambda xx, a, b: fused_tcn_block_pair_ad(  # noqa: E731
        xx, a, b, d1=d1, d2=d2, causal=causal, norm_type="gLN",
        tile=128, interpret=True)
    ref = lambda xx, a, b: _xla_block(  # noqa: E731
        _xla_block(xx, a, d1, causal), b, d2, causal)

    got = _all_grads(fused, x, pa, pb, cot)
    want = _all_grads(ref, x, pa, pb, cot)
    for i, (g, w) in enumerate(zip(got, want)):
        g, w = np.asarray(g, np.float32), np.asarray(w, np.float32)
        denom = np.linalg.norm(w.ravel()) + 1e-12
        rel = np.linalg.norm((g - w).ravel()) / denom
        assert rel < 2e-2, f"cotangent {i}: rel L2 err {rel:.2e}"


def test_pair_bwd_kernel_direct():
    """The raw backward kernel against jax.vjp of the chained blocks with a
    random upstream cotangent (exercises the unpack layout directly)."""
    M, K, B, H, P = 1, 200, 128, 256, 3
    pa = _params9(B, H, P, seed=7)
    pb = _params9(B, H, P, seed=8)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((M, K, B)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((M, K, B)).astype(np.float32))

    dx, ga, gb = fused_tcn_block_pair_bwd(
        x, g, pa, pb, d1=2, d2=4, causal=False, norm_type="gLN",
        tile=128, interpret=True)

    def chain(xx, *p18):
        return _xla_block(_xla_block(xx, p18[:9], 2, False),
                          p18[9:], 4, False)

    _, vjp = jax.vjp(chain, x, *pa, *pb)
    want = vjp(g)
    got = (dx,) + tuple(ga) + tuple(gb)
    for i, (gg, w) in enumerate(zip(got, want)):
        gg, w = np.asarray(gg, np.float32), np.asarray(w, np.float32)
        rel = (np.linalg.norm((gg - w).ravel())
               / (np.linalg.norm(w.ravel()) + 1e-12))
        assert rel < 2e-2, f"cotangent {i}: rel L2 err {rel:.2e}"


def test_pair_bwd_f32_scratch_under_bf16():
    """pair_f32 backward (f32 VMEM scratches under bf16 compute) stays
    within the pair-train probe tolerance of the f32 autodiff chain."""
    M, K, B, H, P = 2, 256, 128, 256, 3
    pa = _params9(B, H, P, seed=4)
    pb = _params9(B, H, P, seed=5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((M, K, B)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((M, K, B)), jnp.bfloat16)
    pa16 = tuple(p.astype(jnp.bfloat16) for p in pa[:3]) + pa[3:]
    pb16 = tuple(p.astype(jnp.bfloat16) for p in pb[:3]) + pb[3:]

    dx, ga, gb = fused_tcn_block_pair_bwd(
        x, g, pa16, pb16, d1=1, d2=2, causal=False, norm_type="gLN",
        tile=128, interpret=True, s_dtype=jnp.float32)

    def chain(xx, *p18):
        return _xla_block(_xla_block(xx, p18[:9], 1, False),
                          p18[9:], 2, False)

    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    _, vjp = jax.vjp(chain, xf, *pa, *pb)
    want = vjp(gf)
    got = (dx,) + tuple(ga) + tuple(gb)
    rels = []
    for gg, w in zip(got, want):
        gg, w = np.asarray(gg, np.float32), np.asarray(w, np.float32)
        rels.append(np.linalg.norm((gg - w).ravel())
                    / (np.linalg.norm(w.ravel()) + 1e-12))
    # bf16 rounding compounds across the chained recompute; the probe gate
    # is 2 * pair tol = 0.12 for bf16 — stay well inside it here
    assert max(rels) < 0.12, f"max rel L2 err {max(rels):.2e}"


def test_pair_train_ready_gates(monkeypatch):
    """Interpret returns 'pair' (gLN only); real backends consult the
    probed registry; the env kill-switch wins."""
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "1")
    assert fused_block_pair_train_ready(1, 2, "gLN", False, True) == "pair"
    assert fused_block_pair_train_ready(1, 2, "cLN", False, True) is None
    assert fused_block_pair_train_ready(1, 2, "BN", False, True) is None
    saved = dict(tbp._PAIR_TRAIN_READY)
    try:
        tbp._PAIR_TRAIN_READY[(4, 8, "gLN", False)] = "pair_f32@800"
        assert fused_block_pair_train_ready(4, 8, "gLN", False, False) == \
            "pair_f32@800"
        assert fused_block_pair_train_ready(16, 32, "gLN", False,
                                            False) is None
    finally:
        tbp._PAIR_TRAIN_READY.clear()
        tbp._PAIR_TRAIN_READY.update(saved)
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "0")
    assert fused_block_pair_train_ready(1, 2, "gLN", False, True) is None


def _tiny_cfg(**kw):
    from convtasnet_tpu.config import ConvTasNetConfig

    return ConvTasNetConfig(
        n_filters=32, kernel_size=16, bottleneck=128, hidden=256,
        conv_kernel=3, num_blocks=2, num_repeats=2, num_speakers=2, **kw)


def test_model_train_grads_pair_vs_singles(monkeypatch):
    """Whole-model parameter gradients with the pair train path engaged
    (interpret on CPU) track the unfused path — the custom-VJP plumbing
    through the TCN loop must be gradient-transparent."""
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params

    cfg = _tiny_cfg(norm_type="gLN", use_pallas=True)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=4000)
    mix = jax.random.normal(jax.random.PRNGKey(1), (2, 4000))

    def loss_fn(params):
        est = ConvTasNet(cfg).apply({"params": params}, mix, train=True)
        return jnp.sum(jnp.square(est.astype(jnp.float32)))

    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "0")
    want = jax.grad(loss_fn)(variables["params"])
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "1")
    got = jax.grad(loss_fn)(variables["params"])
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = dict(jax.tree_util.tree_leaves_with_path(want))
    assert len(flat_g) == len(flat_w)
    for path, g in flat_g:
        w = flat_w[path]
        g = np.asarray(g, np.float32)
        w = np.asarray(w, np.float32)
        rel = (np.linalg.norm((g - w).ravel())
               / (np.linalg.norm(w.ravel()) + 1e-12))
        assert rel < 3e-2, f"{jax.tree_util.keystr(path)}: rel {rel:.2e}"


def test_ensure_probed_pair_train_caches_to_disk(monkeypatch, tmp_path):
    """Pair-train winners persist under pairtrain: keys and a repeat
    process installs them without re-racing."""
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "1")
    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    cfg = _tiny_cfg(use_pallas=True)
    saved = dict(tbp._PAIR_TRAIN_READY)
    races = []

    def fake_probe(pairs, **kw):
        races.append(kw.get("verify_only", False))
        out = {}
        for d1, d2 in pairs:
            out[(d1, d2)] = "pair"
            tbp._PAIR_TRAIN_READY[(d1, d2, cfg.norm_type, cfg.causal)] = \
                "pair"
        return out

    monkeypatch.setattr(tbp, "probe_fused_pair_train", fake_probe)
    monkeypatch.setattr(tbp, "_PAIR_TRAIN_PROBED_SHAPES", set())
    monkeypatch.setattr(tbp, "_PAIR_TRAIN_PROBED_CONFIGS", set())
    try:
        tbp.ensure_probed_pair_train(cfg, batch=2, K=100, verbose=False)
        assert races == [False]
        cache = tb._autotune_cache_load()
        keys = [k for k in cache if k.startswith("pairtrain:")]
        assert len(keys) == 1
        assert cache[keys[0]] == {"1-2": "pair"}
        monkeypatch.setattr(tbp, "_PAIR_TRAIN_PROBED_SHAPES", set())
        monkeypatch.setattr(tbp, "_PAIR_TRAIN_PROBED_CONFIGS", set())
        tbp._PAIR_TRAIN_READY.clear()
        tbp.ensure_probed_pair_train(cfg, batch=2, K=100, verbose=False)
        assert races == [False, True]
        assert tbp._PAIR_TRAIN_READY[(1, 2, cfg.norm_type, cfg.causal)] == \
            "pair"
    finally:
        tbp._PAIR_TRAIN_READY.clear()
        tbp._PAIR_TRAIN_READY.update(saved)


def test_pair_train_probe_interpret_smoke(monkeypatch):
    """The probe runs end-to-end in interpret mode (compile path only) and
    records a winner for a tiny shape."""
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "1")
    saved = dict(tbp._PAIR_TRAIN_READY)
    try:
        res = tbp.probe_fused_pair_train(
            [(1, 2)], K=40, batch=2, bottleneck=8, hidden=16,
            norm_type="gLN", causal=False, dtype=jnp.float32,
            tile=48, interpret=True, autotune=False)
        assert res == {(1, 2): "pair"}
    finally:
        tbp._PAIR_TRAIN_READY.clear()
        tbp._PAIR_TRAIN_READY.update(saved)


def test_model_train_pair_cln_stays_single(monkeypatch):
    """cLN training must NOT engage the pair custom-VJP (gLN-only kernel):
    the model still runs and grads stay finite."""
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params

    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "1")
    cfg = _tiny_cfg(norm_type="cLN", causal=True, use_pallas=True)
    cfg = dataclasses.replace(cfg, num_repeats=1)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=4000)
    mix = jax.random.normal(jax.random.PRNGKey(1), (1, 4000))

    def loss_fn(params):
        est = ConvTasNet(cfg).apply({"params": params}, mix, train=True)
        return jnp.sum(jnp.square(est.astype(jnp.float32)))

    g = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(x, np.float32)).all()
               for x in jax.tree_util.tree_leaves(g))
