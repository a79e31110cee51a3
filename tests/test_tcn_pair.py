"""Two-block fused TCN pair kernel (ops/pallas/tcn_block_pair) vs chained
single blocks — interpret mode on CPU.

The pair kernel keeps the inter-block residual in a VMEM scratch instead of
round-tripping it through HBM (reference block stacking:
``src/conv_tasnet.py:178-188``); these tests pin its numerics against the
exact chained XLA block math and its wiring into the model's TCN loop.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convtasnet_tpu.ops.conv import depthwise_conv1d, pointwise_conv, prelu
from convtasnet_tpu.ops.norm import (
    channelwise_layer_norm,
    global_layer_norm,
)
from convtasnet_tpu.ops.pallas.tcn_block_pair import (
    fused_block_pair_ready,
    fused_tcn_block_pair,
    pair_variant_kwargs,
    probe_fused_block_pairs,
)
from convtasnet_tpu.ops.pallas import tcn_block_pair as tbp


def _xla_block(x, p9, dilation, causal, norm_type):
    w_in, dw, w_out, a1, a2, g1, b1, g2, b2 = p9
    norm = (global_layer_norm if norm_type == "gLN"
            else channelwise_layer_norm)
    y = prelu(pointwise_conv(x, w_in), a1)
    y = norm(y, g1, b1)
    y = prelu(depthwise_conv1d(y, dw, dilation, causal), a2)
    y = norm(y, g2, b2)
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


@pytest.mark.parametrize("norm_type", ["gLN", "cLN"])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("d1,d2", [(1, 2), (4, 8)])
def test_pair_matches_chained_xla(norm_type, causal, d1, d2):
    """Pair kernel == block(d2, block(d1, x)) for both norms, both causal
    modes, d1 != d2, and K not a tile multiple."""
    M, K, B, H, P = 2, 300, 128, 256, 3
    pa = _params9(B, H, P, seed=1)
    pb = _params9(B, H, P, seed=2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((M, K, B)).astype(np.float32))
    got = fused_tcn_block_pair(
        x, pa, pb, d1=d1, d2=d2, causal=causal, norm_type=norm_type,
        tile=128, interpret=True)
    want = _xla_block(_xla_block(x, pa, d1, causal, norm_type),
                      pb, d2, causal, norm_type)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)
    g, w = np.asarray(got).ravel(), np.asarray(want).ravel()
    assert np.corrcoef(g, w)[0, 1] > 0.9999


def test_pair_f32_scratch_under_bf16():
    """pair_f32 (f32 VMEM activation scratch under bf16 compute) tracks the
    f32 chain at least as tightly as the pair tolerance assumes."""
    M, K, B, H, P = 2, 256, 128, 256, 3
    pa = _params9(B, H, P, seed=4)
    pb = _params9(B, H, P, seed=5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((M, K, B)), jnp.bfloat16)
    got = fused_tcn_block_pair(
        x, tuple(p.astype(jnp.bfloat16) for p in pa[:3]) + pa[3:],
        tuple(p.astype(jnp.bfloat16) for p in pb[:3]) + pb[3:],
        d1=2, d2=4, causal=False, norm_type="gLN",
        tile=128, interpret=True, h_dtype=jnp.float32)
    xf = x.astype(jnp.float32)
    want = _xla_block(_xla_block(xf, pa, 2, False, "gLN"),
                      pb, 4, False, "gLN")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=6e-2, atol=6e-2)
    g = np.asarray(got, np.float32).ravel()
    assert np.corrcoef(g, np.asarray(want).ravel())[0, 1] > 0.999


def test_pair_variant_kwargs_decode():
    assert pair_variant_kwargs(None) == {}
    assert pair_variant_kwargs("pair") == {}
    assert pair_variant_kwargs("pair_f32") == {"h_dtype": jnp.float32}
    assert pair_variant_kwargs("pair@800") == {"tile": 800}
    assert pair_variant_kwargs("pair_f32@800") == {
        "h_dtype": jnp.float32, "tile": 800}
    with pytest.raises(ValueError):
        pair_variant_kwargs("store")


def test_pair_ready_gates(monkeypatch):
    """Trace-time gate: interpret returns 'pair' (when enabled); a real
    backend consults the probed registry; the env kill-switch wins."""
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "1")
    assert fused_block_pair_ready(1, 2, "gLN", False, True) == "pair"
    assert fused_block_pair_ready(1, 2, "BN", False, True) is None
    saved = dict(tbp._FUSED_PAIR_READY)
    try:
        tbp._FUSED_PAIR_READY[(4, 8, "cLN", True)] = "pair_f32@800"
        assert fused_block_pair_ready(4, 8, "cLN", True, False) == \
            "pair_f32@800"
        assert fused_block_pair_ready(16, 32, "cLN", True, False) is None
    finally:
        tbp._FUSED_PAIR_READY.clear()
        tbp._FUSED_PAIR_READY.update(saved)
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "0")
    assert fused_block_pair_ready(1, 2, "gLN", False, True) is None


def test_probe_verify_only_reverifies_foreign_winner(monkeypatch):
    """A recorded winner that is not among the current dtype's candidates
    (e.g. pair_f32 recorded under bf16, re-verified at f32) is re-proven as
    recorded instead of silently demoting the pair to unfused."""
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "1")
    saved = dict(tbp._FUSED_PAIR_READY)
    try:
        tbp._FUSED_PAIR_READY[(1, 2, "gLN", False)] = "pair_f32"
        res = probe_fused_block_pairs(
            [(1, 2)], K=40, batch=2, bottleneck=8, hidden=16,
            norm_type="gLN", causal=False, dtype=jnp.float32,
            tile=48, interpret=True, verify_only=True)
        assert res == {(1, 2): "pair_f32"}
    finally:
        tbp._FUSED_PAIR_READY.clear()
        tbp._FUSED_PAIR_READY.update(saved)


def _tiny_cfg(**kw):
    from convtasnet_tpu.config import ConvTasNetConfig

    return ConvTasNetConfig(
        n_filters=32, kernel_size=16, bottleneck=128, hidden=256,
        conv_kernel=3, num_blocks=2, num_repeats=2, num_speakers=2, **kw)


@pytest.mark.parametrize("norm_type,causal", [("gLN", False), ("cLN", True)])
def test_model_pair_fusion_matches_unfused(monkeypatch, norm_type, causal):
    """Whole model with pair fusion engaged (interpret on CPU) vs the same
    params with pair fusion disabled — the TCN loop's pairing, param
    plumbing, and checkpoint layout must be transparent."""
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params

    base = _tiny_cfg(norm_type=norm_type, causal=causal, use_pallas=True)
    variables = init_params(base, jax.random.PRNGKey(0), example_len=4000)
    mix = jax.random.normal(jax.random.PRNGKey(1), (2, 4000))
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "0")
    want = np.asarray(ConvTasNet(base).apply(variables, mix, train=False))
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "1")
    got = np.asarray(ConvTasNet(base).apply(variables, mix, train=False))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999


def test_model_pair_fusion_init_param_layout(monkeypatch):
    """Initializing under pair fusion produces the identical param tree
    (names and shapes) as the unfused model — checkpoints interchange."""
    from convtasnet_tpu.models.conv_tasnet import init_params

    cfg = _tiny_cfg(use_pallas=True)
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "1")
    fused = init_params(cfg, jax.random.PRNGKey(0), example_len=4000)
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "0")
    plain = init_params(cfg, jax.random.PRNGKey(0), example_len=4000)
    f_shapes = jax.tree.map(jnp.shape, fused)
    p_shapes = jax.tree.map(jnp.shape, plain)
    assert f_shapes == p_shapes


def test_model_pair_fusion_odd_block_count(monkeypatch):
    """num_blocks=3: blocks (0,1) pair, block 2 stays single — output still
    matches the unfused model."""
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params

    cfg = _tiny_cfg(use_pallas=True)
    cfg = dataclasses.replace(cfg, num_blocks=3, num_repeats=1)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=4000)
    mix = jax.random.normal(jax.random.PRNGKey(1), (1, 4000))
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "0")
    want = np.asarray(ConvTasNet(cfg).apply(variables, mix, train=False))
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "1")
    got = np.asarray(ConvTasNet(cfg).apply(variables, mix, train=False))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_ensure_probed_pairs_caches_to_disk(monkeypatch, tmp_path):
    """Pair winners persist under pair: keys and a repeat process installs
    them without re-racing (mirrors the single-block disk discipline)."""
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "1")
    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    cfg = _tiny_cfg(use_pallas=True)
    saved = dict(tbp._FUSED_PAIR_READY)
    races = []

    def fake_probe(pairs, **kw):
        races.append(kw.get("verify_only", False))
        out = {}
        for d1, d2 in pairs:
            out[(d1, d2)] = "pair"
            tbp._FUSED_PAIR_READY[(d1, d2, cfg.norm_type, cfg.causal)] = \
                "pair"
        return out

    monkeypatch.setattr(tbp, "probe_fused_block_pairs", fake_probe)
    monkeypatch.setattr(tbp, "_PAIR_PROBED_SHAPES", set())
    monkeypatch.setattr(tbp, "_PAIR_PROBED_CONFIGS", set())
    try:
        tbp.ensure_probed_pairs(cfg, batch=2, K=100, verbose=False)
        assert races == [False]  # full race
        cache = tb._autotune_cache_load()
        pair_keys = [k for k in cache if k.startswith("pair:")]
        assert len(pair_keys) == 1
        assert cache[pair_keys[0]] == {"1-2": "pair"}
        # fresh process: registries empty, disk warm -> verify_only
        monkeypatch.setattr(tbp, "_PAIR_PROBED_SHAPES", set())
        monkeypatch.setattr(tbp, "_PAIR_PROBED_CONFIGS", set())
        tbp._FUSED_PAIR_READY.clear()
        tbp.ensure_probed_pairs(cfg, batch=2, K=100, verbose=False)
        assert races == [False, True]
        assert tbp._FUSED_PAIR_READY[(1, 2, cfg.norm_type, cfg.causal)] == \
            "pair"
    finally:
        tbp._FUSED_PAIR_READY.clear()
        tbp._FUSED_PAIR_READY.update(saved)
