"""Fused Pallas TCN block vs the XLA ops path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convtasnet_tpu.ops.conv import depthwise_conv1d, pointwise_conv, prelu
from convtasnet_tpu.ops.norm import (
    batch_norm,
    channelwise_layer_norm,
    global_layer_norm,
)
from convtasnet_tpu.ops.pallas.tcn_block import fused_tcn_block


def _xla_block(x, w_in, dw, w_out, a1, a2, g1, b1, g2, b2,
               dilation, causal, norm_type, bn_stats=None):
    y = pointwise_conv(x, w_in)
    y = prelu(y, a1)
    if norm_type == "gLN":
        y = global_layer_norm(y, g1, b1)
    elif norm_type == "cLN":
        y = channelwise_layer_norm(y, g1, b1)
    else:
        y = batch_norm(y, g1, b1, bn_stats[0], bn_stats[1])
    y = depthwise_conv1d(y, dw, dilation, causal)
    y = prelu(y, a2)
    if norm_type == "gLN":
        y = global_layer_norm(y, g2, b2)
    elif norm_type == "cLN":
        y = channelwise_layer_norm(y, g2, b2)
    else:
        y = batch_norm(y, g2, b2, bn_stats[2], bn_stats[3])
    return x + pointwise_conv(y, w_out)


def _params(B, H, P, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        w_in=rng.standard_normal((B, H)).astype(np.float32) / np.sqrt(B),
        dw=rng.standard_normal((P, H)).astype(np.float32),
        w_out=rng.standard_normal((H, B)).astype(np.float32) / np.sqrt(H),
        a1=np.float32(0.25), a2=np.float32(0.3),
        g1=rng.standard_normal(H).astype(np.float32),
        b1=rng.standard_normal(H).astype(np.float32),
        g2=rng.standard_normal(H).astype(np.float32),
        b2=rng.standard_normal(H).astype(np.float32),
    )


@pytest.mark.parametrize("norm_type", ["gLN", "cLN", "BN"])
@pytest.mark.parametrize("dilation,causal", [(1, False), (4, False), (2, True)])
def test_fused_block_matches_xla(norm_type, dilation, causal):
    M, K, B, H, P = 2, 300, 128, 256, 3
    p = _params(B, H, P)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((M, K, B)).astype(np.float32))
    bn_stats = None
    if norm_type == "BN":
        bn_stats = tuple(
            jnp.asarray(np.abs(rng.standard_normal(H)).astype(np.float32) + 0.5)
            for _ in range(4))
    args = [jnp.asarray(v) for v in
            (p["w_in"], p["dw"], p["w_out"], p["a1"], p["a2"],
             p["g1"], p["b1"], p["g2"], p["b2"])]
    got = fused_tcn_block(
        x, *args, dilation=dilation, causal=causal, norm_type=norm_type,
        bn_stats=bn_stats, tile=128, interpret=True)
    want = _xla_block(x, args[0], args[1], args[2], args[3], args[4],
                      args[5], args[6], args[7], args[8],
                      dilation, causal, norm_type, bn_stats)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)
    # bf16 VMEM storage bounds accuracy; verify correlation is essentially 1
    g, w = np.asarray(got).ravel(), np.asarray(want).ravel()
    assert np.corrcoef(g, w)[0, 1] > 0.9999


@pytest.mark.parametrize("norm_type", ["gLN", "cLN"])
@pytest.mark.parametrize("store_h2", [True, False])
def test_fused_block_f32_scratch(norm_type, store_h2):
    """The *_f32 autotune variants (f32 VMEM scratches under bf16 compute)
    match the XLA block at least as tightly as the bf16-scratch kernel."""
    M, K, B, H, P = 2, 256, 128, 256, 3
    p = _params(B, H, P, seed=4)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((M, K, B)), jnp.bfloat16)
    args = [jnp.asarray(v, jnp.bfloat16) for v in
            (p["w_in"], p["dw"], p["w_out"])] + [
        jnp.asarray(p["a1"]), jnp.asarray(p["a2"]),
        jnp.asarray(p["g1"]), jnp.asarray(p["b1"]),
        jnp.asarray(p["g2"]), jnp.asarray(p["b2"])]
    got = fused_tcn_block(
        x, *args, dilation=4, causal=False, norm_type=norm_type,
        tile=128, interpret=True, store_h2=store_h2, h_dtype=jnp.float32)
    want = _xla_block(
        x.astype(jnp.float32), *[a.astype(jnp.float32) for a in args],
        4, False, norm_type)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=5e-2, atol=5e-2)
    g, w = np.asarray(got, np.float32).ravel(), np.asarray(want).ravel()
    assert np.corrcoef(g, w)[0, 1] > 0.999


def test_variant_params_decode():
    from convtasnet_tpu.ops.pallas.tcn_block import variant_params

    assert variant_params(None) == (None, None, None)
    assert variant_params("auto") == (None, None, None)
    assert variant_params("store") == (True, None, None)
    assert variant_params("recompute") == (False, None, None)
    assert variant_params("store_f32") == (True, jnp.float32, None)
    assert variant_params("recompute_f32") == (False, jnp.float32, None)
    assert variant_params("store@800") == (True, None, 800)
    assert variant_params("recompute_f32@800") == (False, jnp.float32, 800)


def test_fused_block_pads_k():
    """K not a multiple of the tile gets padded and un-padded correctly."""
    M, K, B, H, P = 1, 333, 128, 256, 3
    p = _params(B, H, P, seed=2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((M, K, B)).astype(np.float32))
    args = [jnp.asarray(v) for v in
            (p["w_in"], p["dw"], p["w_out"], p["a1"], p["a2"],
             p["g1"], p["b1"], p["g2"], p["b2"])]
    got = fused_tcn_block(x, *args, dilation=8, causal=False,
                          norm_type="gLN", tile=128, interpret=True)
    want = _xla_block(x, *args, 8, False, "gLN")
    assert got.shape == (M, K, B)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("norm_type,dilation,causal,store_e,s_dtype", [
    ("gLN", 1, False, True, None), ("gLN", 4, False, True, None),
    ("gLN", 4, False, False, None), ("gLN", 2, True, True, None),
    ("cLN", 1, False, True, None), ("cLN", 4, False, True, None),
    ("cLN", 2, True, True, None),
    ("gLN", 4, False, True, jnp.float32),
    ("cLN", 4, False, True, jnp.float32),
])
def test_fused_backward_kernel_matches_autodiff(norm_type, dilation, causal,
                                                store_e, s_dtype):
    """Single-kernel fused backward vs jax.vjp of the XLA block math,
    every cotangent (dx + all 9 weight/affine/slope grads)."""
    from convtasnet_tpu.ops.pallas.tcn_block_bwd import fused_tcn_block_bwd

    M, K, B, H, P = 2, 300, 24, 40, 3
    p = _params(B, H, P, seed=4)
    # negative second slope: exercises the sign-flip case of PReLU'
    p["a2"] = np.float32(-0.1)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((M, K, B)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((M, K, B)).astype(np.float32))
    args = [jnp.asarray(v) for v in
            (p["w_in"], p["dw"], p["w_out"], p["a1"], p["a2"],
             p["g1"], p["b1"], p["g2"], p["b2"])]

    def block(xx, w_in, dw, w_out, a1, a2, g1, b1, g2, b2):
        return _xla_block(xx, w_in, dw, w_out, a1, a2, g1, b1, g2, b2,
                          dilation, causal, norm_type)

    _, vjp = jax.vjp(block, x, *args)
    want = vjp(g)
    got = fused_tcn_block_bwd(
        x, g, *args, dilation=dilation, causal=causal, norm_type=norm_type,
        tile=128, interpret=True, store_e=store_e, s_dtype=s_dtype)
    assert len(got) == 10
    for name, w, q in zip(
            ["dx", "dW_in", "d_dw", "dW_out", "da1", "da2",
             "dg1", "db1", "dg2", "db2"], want, got):
        w, q = np.asarray(w), np.asarray(q)
        assert q.shape == w.shape, name
        scale = np.max(np.abs(w)) + 1e-9
        np.testing.assert_allclose(q / scale, w / scale, atol=5e-5,
                                   err_msg=name)


@pytest.mark.parametrize("norm_type,causal", [("gLN", False), ("cLN", True)])
def test_fused_ad_train_path_gradients(norm_type, causal):
    """Whole-model loss gradients: fused train path (Pallas fwd + fused bwd,
    interpret) vs plain XLA autodiff."""
    import dataclasses
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params

    base = ConvTasNetConfig(
        n_filters=32, kernel_size=16, bottleneck=128, hidden=256,
        conv_kernel=3, num_blocks=2, num_repeats=1, num_speakers=2,
        norm_type=norm_type, causal=causal)
    variables = init_params(base, jax.random.PRNGKey(0), example_len=2000)
    mix = jax.random.normal(jax.random.PRNGKey(1), (2, 2000))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 2000))

    def make_loss(cfg):
        model = ConvTasNet(cfg)

        def loss(params):
            est = model.apply({"params": params}, mix, train=True)
            return jnp.mean((est - tgt) ** 2)

        return loss

    l_ref, g_ref = jax.value_and_grad(make_loss(base))(variables["params"])
    fast = dataclasses.replace(base, use_pallas=True)
    l_got, g_got = jax.value_and_grad(make_loss(fast))(variables["params"])
    assert abs(float(l_got) - float(l_ref)) < 5e-4 * max(abs(float(l_ref)), 1)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_got = jax.tree_util.tree_leaves(g_got)
    for (path, r), q in zip(flat_ref, flat_got):
        r, q = np.asarray(r), np.asarray(q)
        scale = np.max(np.abs(r)) + 1e-9
        # f32 compute → f32 kernel scratch: the fused forward is
        # bit-consistent with the backward's recompute, so grads match XLA
        # autodiff to f32 reduction-order noise
        np.testing.assert_allclose(q / scale, r / scale, atol=1e-3,
                                   err_msg=str(path))
        if r.size > 1:
            assert np.corrcoef(q.ravel(), r.ravel())[0, 1] > 0.9999, path


def test_model_use_pallas_matches_xla_path():
    """Whole model with use_pallas (interpret on CPU) vs the XLA path."""
    import dataclasses
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params

    base = ConvTasNetConfig(
        n_filters=32, kernel_size=16, bottleneck=128, hidden=256,
        conv_kernel=3, num_blocks=2, num_repeats=2, num_speakers=2)
    variables = init_params(base, jax.random.PRNGKey(0), example_len=4000)
    mix = jax.random.normal(jax.random.PRNGKey(1), (2, 4000))
    want = np.asarray(ConvTasNet(base).apply(variables, mix, train=False))
    fast_cfg = dataclasses.replace(base, use_pallas=True)
    got = np.asarray(ConvTasNet(fast_cfg).apply(variables, mix, train=False))
    # bf16 VMEM storage in the fused path perturbs mask-boundary values;
    # bulk agreement + correlation is the right check
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999


def test_probe_verify_only_keeps_winner_and_skips_races():
    """verify_only re-proves the recorded winner's compile at a new shape
    without re-racing; dilations whose winner is None stay on XLA with no
    compile at all."""
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    key_won = (3, "gLN", False)
    key_xla = (5, "gLN", False)
    saved = dict(tb._FUSED_READY)
    try:
        tb._FUSED_READY[key_won] = "store"
        tb._FUSED_READY[key_xla] = None
        res = tb.probe_fused_block(
            [3, 5], K=40, batch=2, bottleneck=8, hidden=16,
            norm_type="gLN", causal=False, dtype=jnp.float32,
            tile=48, interpret=True, verify_only=True)
        assert res == {3: "store", 5: None}
        assert tb._FUSED_READY[key_won] == "store"
        assert tb._FUSED_READY[key_xla] is None
    finally:
        tb._FUSED_READY.clear()
        tb._FUSED_READY.update(saved)


def test_ensure_probed_races_once_per_config(monkeypatch, tmp_path):
    """The second distinct shape of the same config must go through the
    verify_only fast path, not a full autotune race."""
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    calls = []

    def fake_probe(cfg, K, batch, verbose=False, verify_only=False):
        calls.append((batch, K, verify_only))
        return {}

    monkeypatch.setattr(tb, "probe_for_config", fake_probe)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    saved_shapes, saved_cfgs = set(tb._PROBED_SHAPES), set(tb._PROBED_CONFIGS)
    try:
        tb._PROBED_SHAPES.clear()
        tb._PROBED_CONFIGS.clear()
        cfg = ConvTasNetConfig(use_pallas=True)
        tb.ensure_probed(cfg, 8, 32000)
        tb.ensure_probed(cfg, 8, 32000)   # same shape: cached, no call
        tb.ensure_probed(cfg, 4, 16000)   # new shape: verify_only
        assert [c[2] for c in calls] == [False, True]
    finally:
        tb._PROBED_SHAPES.clear()
        tb._PROBED_SHAPES.update(saved_shapes)
        tb._PROBED_CONFIGS.clear()
        tb._PROBED_CONFIGS.update(saved_cfgs)


def test_autotune_winners_persist_to_disk(monkeypatch, tmp_path):
    """A fresh process (cleared registries) with the same (shape, config)
    loads the recorded winners from disk and only compile-verifies them."""
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    calls = []

    def fake_probe(cfg, K, batch, verbose=False, verify_only=False):
        calls.append(verify_only)
        if not verify_only:
            tb._FUSED_READY[(1, cfg.norm_type, cfg.causal)] = "store_f32"
            tb._FUSED_READY[(2, cfg.norm_type, cfg.causal)] = None
            return {1: "store_f32", 2: None}
        return {d: tb._FUSED_READY.get((d, cfg.norm_type, cfg.causal))
                for d in (1, 2)}

    monkeypatch.setattr(tb, "probe_for_config", fake_probe)
    saved = (dict(tb._FUSED_READY), set(tb._PROBED_SHAPES),
             set(tb._PROBED_CONFIGS))
    try:
        tb._FUSED_READY.clear()
        tb._PROBED_SHAPES.clear()
        tb._PROBED_CONFIGS.clear()
        cfg = ConvTasNetConfig(use_pallas=True, num_blocks=2)
        tb.ensure_probed(cfg, 8, 32000, verbose=False)
        assert calls == [False]
        assert (tmp_path / "autotune.json").exists()

        # "new process": registries and shape caches empty again
        tb._FUSED_READY.clear()
        tb._PROBED_SHAPES.clear()
        tb._PROBED_CONFIGS.clear()
        tb.ensure_probed(cfg, 8, 32000, verbose=False)
        assert calls == [False, True]  # disk hit -> verify_only, no race
        assert tb._FUSED_READY[(1, "gLN", False)] == "store_f32"
        assert tb._FUSED_READY[(2, "gLN", False)] is None

        # version bump invalidates
        monkeypatch.setattr(tb, "_AUTOTUNE_CACHE_VERSION", 99)
        tb._FUSED_READY.clear()
        tb._PROBED_SHAPES.clear()
        tb._PROBED_CONFIGS.clear()
        tb.ensure_probed(cfg, 8, 32000, verbose=False)
        assert calls == [False, True, False]  # stale cache -> full race
    finally:
        tb._FUSED_READY.clear()
        tb._FUSED_READY.update(saved[0])
        tb._PROBED_SHAPES.clear()
        tb._PROBED_SHAPES.update(saved[1])
        tb._PROBED_CONFIGS.clear()
        tb._PROBED_CONFIGS.update(saved[2])


def _clear_probe_state(tb):
    tb._FUSED_READY.clear()
    tb._PROBED_SHAPES.clear()
    tb._PROBED_CONFIGS.clear()


def test_autotune_cache_env_fingerprint_invalidates(monkeypatch, tmp_path):
    """Winners written under one environment fingerprint (device kind /
    jax version / kernel source hash) are not trusted under another."""
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    calls = []

    def fake_probe(cfg, K, batch, verbose=False, verify_only=False):
        calls.append(verify_only)
        if not verify_only:
            tb._FUSED_READY[(1, cfg.norm_type, cfg.causal)] = "store"
            return {1: "store"}
        return {1: tb._FUSED_READY.get((1, cfg.norm_type, cfg.causal))}

    monkeypatch.setattr(tb, "probe_for_config", fake_probe)
    saved = (dict(tb._FUSED_READY), set(tb._PROBED_SHAPES),
             set(tb._PROBED_CONFIGS))
    try:
        _clear_probe_state(tb)
        cfg = ConvTasNetConfig(use_pallas=True, num_blocks=1)
        tb.ensure_probed(cfg, 8, 32000, verbose=False)
        assert calls == [False]

        # same env: disk hit -> verify_only
        _clear_probe_state(tb)
        tb.ensure_probed(cfg, 8, 32000, verbose=False)
        assert calls == [False, True]

        # "new chip / new jaxlib / edited kernel": full re-race
        monkeypatch.setattr(tb, "_env_fingerprint", lambda: "other-env")
        _clear_probe_state(tb)
        tb.ensure_probed(cfg, 8, 32000, verbose=False)
        assert calls == [False, True, False]
    finally:
        _clear_probe_state(tb)
        tb._FUSED_READY.update(saved[0])
        tb._PROBED_SHAPES.update(saved[1])
        tb._PROBED_CONFIGS.update(saved[2])


def test_autotune_cache_empty_entry_reraces(monkeypatch, tmp_path):
    """An empty cached entry ({}) is NOT a disk hit: it must re-race, not
    install zero winners and silently degrade every dilation to XLA."""
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    calls = []

    def fake_probe(cfg, K, batch, verbose=False, verify_only=False):
        calls.append(verify_only)
        return {}

    monkeypatch.setattr(tb, "probe_for_config", fake_probe)
    saved = (dict(tb._FUSED_READY), set(tb._PROBED_SHAPES),
             set(tb._PROBED_CONFIGS))
    try:
        _clear_probe_state(tb)
        cfg = ConvTasNetConfig(use_pallas=True, num_blocks=1)
        tb.ensure_probed(cfg, 8, 32000, verbose=False)  # stores {}
        _clear_probe_state(tb)
        tb.ensure_probed(cfg, 8, 32000, verbose=False)
        assert calls == [False, False]  # {} on disk -> full race again
    finally:
        _clear_probe_state(tb)
        tb._FUSED_READY.update(saved[0])
        tb._PROBED_SHAPES.update(saved[1])
        tb._PROBED_CONFIGS.update(saved[2])


def test_verify_numerics_gate():
    """The probe numerics gate: matching candidates pass, mismatching and
    crashing candidates are rejected, and an unavailable reference keeps
    every candidate (cannot verify)."""
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    ref = np.ones((4, 8), np.float32)

    def boom():
        raise RuntimeError("runtime failure")

    fns = {
        "good": lambda: ref + 1e-5,
        "bad": lambda: ref * 3.0,
        "crash": boom,
    }
    ok, errs, verified = tb._verify_numerics(fns, lambda: ref, tol=1e-3)
    assert verified
    assert ok == {"good"}
    assert errs["bad"] > 1.0
    assert errs["crash"] == float("inf")

    ok2, _, verified2 = tb._verify_numerics(fns, boom, tol=1e-3)
    assert not verified2
    assert ok2 == set(fns)  # reference unavailable: keep (compile passed)


def test_probe_numerics_gate_rejects_bad_candidate(monkeypatch):
    """End-to-end probe with the numerics gate forced on (interpret mode on
    CPU): a candidate reported as mismatching by the gate cannot win."""
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    real_verify = tb._verify_numerics

    def reject_store(exec_fns, ref_fn, tol):
        ok, errs, verified = real_verify(exec_fns, ref_fn, tol)
        ok.discard("store")  # pretend "store" miscompiled
        errs["store"] = 1.0
        return ok, errs, verified

    monkeypatch.setattr(tb, "_verify_numerics", reject_store)
    saved = dict(tb._FUSED_READY)
    try:
        res = tb.probe_fused_block(
            [2], K=40, batch=2, bottleneck=8, hidden=16,
            norm_type="gLN", causal=False, dtype=jnp.float32,
            tile=48, interpret=True, autotune=False, check_numerics=True)
        assert res[2] == "recompute"  # the surviving gLN variant wins
        assert tb._FUSED_READY[(2, "gLN", False)] == "recompute"
    finally:
        tb._FUSED_READY.clear()
        tb._FUSED_READY.update(saved)


def test_probe_numerics_gate_passes_correct_kernels():
    """With no tampering, every interpret-mode variant passes the on-device
    numerics gate (f32: tight tolerance) and probing still records one."""
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    saved = dict(tb._FUSED_READY)
    try:
        res = tb.probe_fused_block(
            [1], K=40, batch=2, bottleneck=8, hidden=16,
            norm_type="cLN", causal=True, dtype=jnp.float32,
            tile=48, interpret=True, autotune=False, check_numerics=True)
        assert res[1] == "store"
    finally:
        tb._FUSED_READY.clear()
        tb._FUSED_READY.update(saved)


def test_train_probe_numerics_gate_demotes_bad_winner(monkeypatch):
    """A train-path winner whose all-cotangent check fails is demoted to
    plain autodiff (None)."""
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    monkeypatch.setattr(
        tb, "_train_grads_numerics",
        lambda fused10, xla10, x, wargs, tol: (False, 1.0))
    saved = dict(tb._FUSED_BWD_READY)
    try:
        res = tb.probe_fused_block_train(
            [1], K=40, batch=2, bottleneck=8, hidden=16,
            norm_type="cLN", causal=False, dtype=jnp.float32,
            tile=48, autotune=False, interpret=True, check_numerics=True)
        assert res[1] is None
        assert tb._FUSED_BWD_READY[(1, "cLN", False)] is None
    finally:
        tb._FUSED_BWD_READY.clear()
        tb._FUSED_BWD_READY.update(saved)


def test_train_probe_numerics_gate_passes_correct_backward():
    """The real fused backward passes the all-cotangent gate in interpret
    mode and stays recorded."""
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    saved = dict(tb._FUSED_BWD_READY)
    try:
        res = tb.probe_fused_block_train(
            [1], K=40, batch=2, bottleneck=8, hidden=16,
            norm_type="cLN", causal=False, dtype=jnp.float32,
            tile=48, autotune=False, interpret=True, check_numerics=True)
        assert res[1] in ("store", "store_f32")
    finally:
        tb._FUSED_BWD_READY.clear()
        tb._FUSED_BWD_READY.update(saved)


def test_train_probe_verify_only_keeps_winner():
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    saved = dict(tb._FUSED_BWD_READY)
    try:
        tb._FUSED_BWD_READY[(3, "gLN", False)] = "store"
        tb._FUSED_BWD_READY[(5, "gLN", False)] = None
        res = tb.probe_fused_block_train(
            [3, 5], K=40, batch=2, bottleneck=8, hidden=16,
            norm_type="gLN", causal=False, dtype=jnp.float32,
            tile=48, verify_only=True)
        assert res[5] is None
        assert res[3] in ("store", None)  # None only if compile failed
    finally:
        tb._FUSED_BWD_READY.clear()
        tb._FUSED_BWD_READY.update(saved)
