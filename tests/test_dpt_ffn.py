"""Fused dual-path FFN kernel vs the XLA sublayer.

Same trust layers as the attention kernel's tests (interpret mode on
CPU): kernel == ``xla_ffn``; ``xla_ffn`` == the flax ``_FFNSublayer``
(the probe's numerics reference must be the real model math); the
in-model gate engages for inference only (training autodiffs through
the XLA ops); the registry/disk cache behave hermetically.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convtasnet_tpu.ops.pallas import dpt_ffn as dpf


def _mk(M, K, B, F, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((M, K, B)), dtype)
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(B), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(B), jnp.float32)
    w_up = jnp.asarray(rng.standard_normal((B, F)) / np.sqrt(B), dtype)
    b_up = jnp.asarray(0.05 * rng.standard_normal(F), jnp.float32)
    w_down = jnp.asarray(rng.standard_normal((F, B)) / np.sqrt(F), dtype)
    b_down = jnp.asarray(0.05 * rng.standard_normal(B), jnp.float32)
    return x, (gamma, beta, w_up, b_up, w_down, b_down)


def _rel(got, want):
    g = np.asarray(got, np.float32).ravel()
    w = np.asarray(want, np.float32).ravel()
    return float(np.linalg.norm(g - w) / (np.linalg.norm(w) + 1e-12))


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("shape", [(2, 96, 128, 256), (1, 64, 256, 128)])
def test_kernel_matches_xla(shape, dtype, tol):
    M, K, B, F = shape
    x, args = _mk(M, K, B, F, dtype)
    want = dpf.xla_ffn(x, *args)
    for kt in (None, K // 2):
        got = dpf.fused_ffn(x, *args, k_tile=kt, interpret=True)
        assert got.dtype == x.dtype
        assert _rel(got, want) < tol


def test_xla_ref_matches_flax_sublayer():
    """The probe's numerics reference IS the model math (guards drift).
    ``train=True`` keeps the flax module on its XLA ops."""
    from convtasnet_tpu.models.dual_path import _FFNSublayer

    M, n, S, B, F = 2, 3, 32, 128, 256
    x, (g, b, wu, bu, wd, bd) = _mk(M, n * S, B, F, jnp.float32)
    x4 = x.reshape(M, n, S, B)
    mod = _FFNSublayer(B, F, train=True)
    vs = {"params": {"norm": {"gamma": g, "beta": b},
                     "up": {"kernel": wu, "bias": bu},
                     "down": {"kernel": wd, "bias": bd}}}
    want = mod.apply(vs, x4).reshape(M, n * S, B)
    got = dpf.xla_ffn(x, g, b, wu, bu, wd, bd)
    assert _rel(got, want) < 1e-6


def test_param_tree_matches_dense_layout():
    """_DenseParams keeps the exact nn.Dense param paths/shapes — existing
    checkpoints must load unchanged."""
    from convtasnet_tpu.models.dual_path import _FFNSublayer

    mod = _FFNSublayer(128, 256)
    vs = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 128)))
    p = vs["params"]
    assert p["up"]["kernel"].shape == (128, 256)
    assert p["up"]["bias"].shape == (256,)
    assert p["down"]["kernel"].shape == (256, 128)
    assert p["down"]["bias"].shape == (128,)
    assert set(p) == {"norm", "up", "down"}


def test_sublayer_gate_engages_for_inference_only():
    """On CPU the registry reports ready (interpret): inference returns
    the kernel's output, training the XLA path's — numerically equal, and
    gradients must flow through the training path."""
    from convtasnet_tpu.models.dual_path import _FFNSublayer

    M, n, S, B, F = 1, 2, 16, 128, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, n, S, B)), jnp.float32)
    infer = _FFNSublayer(B, F, train=False)
    trainm = _FFNSublayer(B, F, train=True)
    vs = infer.init(jax.random.PRNGKey(0), x)
    out_i = infer.apply(vs, x)
    out_t = trainm.apply(vs, x)
    assert _rel(out_i, out_t) < 1e-5

    def loss(params):
        return jnp.sum(trainm.apply({"params": params}, x) ** 2)

    grads = jax.grad(loss)(vs["params"])
    norms = [float(jnp.linalg.norm(g))
             for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(norms)) and max(norms) > 0


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-4),
                                       (jnp.bfloat16, 4e-2)])
def test_fused_vjp_matches_autodiff(dtype, tol):
    """The fused single-kernel backward reproduces every XLA-autodiff
    cotangent (dx, dgamma, dbeta, dW_up, db_up, dW_down, db_down) — the
    training-path trust gate, in interpret mode."""
    M, K, B, F = 2, 96, 128, 256
    x, args = _mk(M, K, B, F, dtype, seed=3)

    def loss_of(fn):
        def f(x_, *a):
            return jnp.sum(fn(x_, *a).astype(jnp.float32) ** 2)

        return f

    argnums = tuple(range(7))
    fused = loss_of(lambda *a: dpf.fused_ffn_ad(*a, bwd=True,
                                                interpret=True))
    ref = loss_of(dpf.xla_ffn)
    got = jax.grad(fused, argnums=argnums)(x, *args)
    want = jax.grad(ref, argnums=argnums)(x, *args)
    names = ["dx", "dgamma", "dbeta", "dwup", "dbup", "dwdn", "dbdn"]
    for name, g_, w_ in zip(names, got, want):
        assert _rel(g_, w_) < tol, name
    assert got[0].dtype == x.dtype


def test_train_gate_engages_fused_pair_on_cpu():
    """With train=True the sublayer routes through the custom-VJP pair in
    interpret mode — output equals inference, and gradients flow."""
    from convtasnet_tpu.models.dual_path import _FFNSublayer

    M, n, S, B, F = 1, 2, 16, 128, 128
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((M, n, S, B)), jnp.float32)
    trainm = _FFNSublayer(B, F, train=True)
    vs = trainm.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(trainm.apply({"params": params}, x) ** 2)

    val, grads = jax.value_and_grad(loss)(vs["params"])
    # reference: pure-XLA module (use_pallas off)
    ref = _FFNSublayer(B, F, train=True, use_pallas=False)
    rval, rgrads = jax.value_and_grad(
        lambda p: jnp.sum(ref.apply({"params": p}, x) ** 2))(vs["params"])
    assert abs(float(val) - float(rval)) / abs(float(rval)) < 1e-5
    for g_, w_ in zip(jax.tree_util.tree_leaves(grads),
                      jax.tree_util.tree_leaves(rgrads)):
        assert _rel(g_, w_) < 1e-4


def test_train_registry_and_disk_cache(monkeypatch, tmp_path):
    """ensure_probed_dpt_ffn_train: races once per config, verifies later
    shapes, persists the winner under dpt:ffn-train: keys, and a fresh
    process loads it from disk. Hermetic via CONVTASNET_AUTOTUNE_CACHE."""
    from convtasnet_tpu.config import ConvTasNetConfig

    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    cfg = ConvTasNetConfig(separator="dpt", bottleneck=128, dpt_chunk=16,
                           dpt_ff=256, use_pallas=True)
    calls = []

    def fake_train_probe(**kw):
        calls.append(kw)
        key = (kw["M"], kw["Kp"], kw["B"], kw["F"], str(jnp.dtype(kw["dtype"])))
        dpf._FFN_BWD_READY[key] = True
        return True

    monkeypatch.setattr(dpf, "probe_fused_ffn_train", fake_train_probe)
    monkeypatch.setattr(dpf, "ensure_probed_dpt_ffn", lambda *a, **k: None)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dpf, "_FFN_BWD_READY", {})
    monkeypatch.setattr(dpf, "_FFN_BWD_CONFIG", {})
    monkeypatch.setattr(dpf, "_FFN_PROBED", set())

    T = 16 * 100 * cfg.stride
    dpf.ensure_probed_dpt_ffn_train(cfg, 4, T, verbose=False)
    assert len(calls) == 1 and "autotune" not in calls[-1]
    dpf.ensure_probed_dpt_ffn_train(cfg, 4, T, verbose=False)  # idempotent
    assert len(calls) == 1
    # another shape of the same config: compile+numerics verify, no race
    dpf.ensure_probed_dpt_ffn_train(cfg, 4, T * 2, verbose=False)
    assert len(calls) == 2 and calls[-1]["autotune"] is False

    # fresh process: disk hit -> verify_only compile check
    monkeypatch.setattr(dpf, "_FFN_BWD_READY", {})
    monkeypatch.setattr(dpf, "_FFN_BWD_CONFIG", {})
    monkeypatch.setattr(dpf, "_FFN_PROBED", set())
    dpf.ensure_probed_dpt_ffn_train(cfg, 4, T, verbose=False)
    assert len(calls) == 3 and calls[-1]["verify_only"] is True

    path = os.path.join(str(tmp_path), "autotune.json")
    with open(path) as f:
        data = json.load(f)
    assert any(k.startswith("dpt:ffn-train:") for k in data["entries"])


def test_registry_and_disk_cache(monkeypatch, tmp_path):
    """ensure_probed_dpt_ffn: races once per config, verifies later
    shapes, persists the winner under dpt:ffn: keys, and a fresh process
    loads it from disk. Hermetic via CONVTASNET_AUTOTUNE_CACHE."""
    from convtasnet_tpu.config import ConvTasNetConfig

    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    cfg = ConvTasNetConfig(separator="dpt", bottleneck=128, dpt_chunk=16,
                           dpt_ff=256, use_pallas=True)
    calls = []

    def fake_probe(**kw):
        calls.append(kw)
        key = (kw["M"], kw["Kp"], kw["B"], kw["F"], str(jnp.dtype(kw["dtype"])))
        dpf._FFN_READY[key] = kw.get("only_tile") or 64
        return dpf._FFN_READY[key]

    monkeypatch.setattr(dpf, "probe_fused_ffn", fake_probe)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dpf, "_FFN_READY", {})
    monkeypatch.setattr(dpf, "_FFN_CONFIG_WINNERS", {})
    monkeypatch.setattr(dpf, "_FFN_PROBED", set())

    T = 16 * 100 * cfg.stride
    dpf.ensure_probed_dpt_ffn(cfg, 4, T, verbose=False)
    assert len(calls) == 1 and "only_tile" not in calls[-1]
    dpf.ensure_probed_dpt_ffn(cfg, 4, T, verbose=False)  # idempotent
    assert len(calls) == 1
    # another shape of the same config: compile+numerics verify, no race
    dpf.ensure_probed_dpt_ffn(cfg, 4, T * 2, verbose=False)
    assert len(calls) == 2 and calls[-1]["autotune"] is False

    # fresh process: disk hit -> compile-only verify of the stored tile
    monkeypatch.setattr(dpf, "_FFN_READY", {})
    monkeypatch.setattr(dpf, "_FFN_CONFIG_WINNERS", {})
    monkeypatch.setattr(dpf, "_FFN_PROBED", set())
    dpf.ensure_probed_dpt_ffn(cfg, 4, T, verbose=False)
    assert len(calls) == 3 and calls[-1]["check_numerics"] is False

    path = os.path.join(str(tmp_path), "autotune.json")
    with open(path) as f:
        data = json.load(f)
    assert any(k.startswith("dpt:ffn:") for k in data["entries"])
