"""Fused dual-path intra-attention kernel vs the XLA sublayer.

Same three trust layers as ``test_dpt_pallas.py`` (interpret mode on
CPU):
1. the Pallas kernel computes ``xla_intra_attention`` (pad masks, both
   dtypes, chunk-tile variants) and its fused single-kernel backward
   reproduces every autodiff cotangent;
2. ``xla_intra_attention`` stays in sync with the flax
   ``_AttentionSublayer`` (attend_axis=2 — the probe's numerics
   reference must be the real model math);
3. the in-model gate and the registry/disk cache behave hermetically.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convtasnet_tpu.ops.pallas import dpt_intra as dpi


def _mk(M, n, S, B, h, dtype, seed=0, pad=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((M, n, S, B)), dtype)
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(B), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(B), jnp.float32)
    w_qkv = jnp.asarray(rng.standard_normal((B, 3 * B)) / np.sqrt(B), dtype)
    w_out = jnp.asarray(rng.standard_normal((B, B)) / np.sqrt(B), dtype)
    valid = np.ones((n, S), bool)
    if pad:
        valid[-1, S // 3:] = False
    bias = jnp.asarray(np.where(valid, 0.0, dpi.NEG_INF), jnp.float32)
    return x, (gamma, beta, w_qkv, w_out, bias), jnp.asarray(valid)


def _rel(got, want):
    g = np.asarray(got, np.float32).ravel()
    w = np.asarray(want, np.float32).ravel()
    return float(np.linalg.norm(g - w) / (np.linalg.norm(w) + 1e-12))


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("shape", [(2, 4, 32, 128, 4), (1, 6, 64, 256, 8)])
def test_kernel_matches_xla(shape, dtype, tol):
    M, n, S, B, h = shape
    x, args, _ = _mk(M, n, S, B, h, dtype)
    want = dpi.xla_intra_attention(x, *args, n_heads=h)
    for ct in (None, 2):
        got = dpi.fused_intra_attention(x, *args, n_heads=h, c_tile=ct,
                                        interpret=True)
        assert got.dtype == x.dtype
        assert _rel(got, want) < tol


def test_kernel_no_mask():
    M, n, S, B, h = 2, 4, 16, 128, 4
    x, (g, b, wq, wo, _), _ = _mk(M, n, S, B, h, jnp.float32, pad=False)
    want = dpi.xla_intra_attention(x, g, b, wq, wo, None, n_heads=h)
    got = dpi.fused_intra_attention(x, g, b, wq, wo, None, n_heads=h,
                                    interpret=True)
    assert _rel(got, want) < 1e-5


def test_pad_content_invariance():
    """Masked key positions must not influence valid outputs (the
    separator relies on this: padded tail frames carry arbitrary
    values)."""
    M, n, S, B, h = 1, 4, 16, 128, 4
    x, args, valid = _mk(M, n, S, B, h, jnp.float32)
    out1 = dpi.fused_intra_attention(x, *args, n_heads=h, interpret=True)
    x2 = jnp.where(valid[None, :, :, None], x, 37.0)
    out2 = dpi.fused_intra_attention(x2, *args, n_heads=h, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out1)[0][np.asarray(valid)],
        np.asarray(out2)[0][np.asarray(valid)], rtol=2e-5, atol=2e-5)


def test_xla_ref_matches_flax_sublayer():
    """The probe's numerics reference IS the model math (guards drift)."""
    from convtasnet_tpu.models.dual_path import _AttentionSublayer

    M, n, S, B, h = 2, 5, 32, 128, 4
    x, (g, b, wq, wo, bias), valid = _mk(M, n, S, B, h, jnp.float32)
    # use_pallas=False: the gate would otherwise route to the fused path
    # on CPU (interpret) and this test must pin the XLA branch itself
    mod = _AttentionSublayer(B, h, attend_axis=2, use_pallas=False)
    vs = {"params": {"norm": {"gamma": g, "beta": b},
                     "qkv": {"kernel": wq}, "out": {"kernel": wo}}}
    want = mod.apply(vs, x, valid)
    got = dpi.xla_intra_attention(x, g, b, wq, wo, bias, n_heads=h)
    assert _rel(got, want) < 1e-6


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-4),
                                       (jnp.bfloat16, 4e-2)])
def test_fused_vjp_matches_autodiff(dtype, tol):
    """The fused single-kernel backward reproduces every XLA-autodiff
    cotangent (dx, dgamma, dbeta, dW_qkv, dW_out) — the training-path
    trust gate, in interpret mode."""
    M, n, S, B, h = 2, 4, 32, 128, 4
    x, (g, b, wq, wo, bias), _ = _mk(M, n, S, B, h, dtype, seed=3)

    def loss_of(fn):
        def f(x_, g_, b_, wq_, wo_):
            return jnp.sum(fn(x_, g_, b_, wq_, wo_).astype(jnp.float32) ** 2)

        return f

    fused = loss_of(lambda *a: dpi.fused_intra_attention_ad(
        *a, bias, n_heads=h, c_tile=2, bwd=True, interpret=True))
    ref = loss_of(lambda *a: dpi.xla_intra_attention(*a, bias, n_heads=h))
    got = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(x, g, b, wq, wo)
    want = jax.grad(ref, argnums=(0, 1, 2, 3, 4))(x, g, b, wq, wo)
    for name, g_, w_ in zip(["dx", "dgamma", "dbeta", "dwqkv", "dwout"],
                            got, want):
        assert _rel(g_, w_) < tol, name
    assert got[0].dtype == x.dtype


def test_sublayer_gate_routes_intra_to_fused():
    """On CPU the registry reports ready (interpret): the attend_axis=2
    sublayer's fused path equals its XLA path, for inference and
    training, and gradients flow through the training pair."""
    from convtasnet_tpu.models.dual_path import _AttentionSublayer

    M, n, S, B, h = 2, 4, 16, 128, 4
    x, _, valid = _mk(M, n, S, B, h, jnp.float32)
    fused = _AttentionSublayer(B, h, attend_axis=2, train=False)
    xla = _AttentionSublayer(B, h, attend_axis=2, train=False,
                             use_pallas=False)
    train = _AttentionSublayer(B, h, attend_axis=2, train=True)
    vs = train.init(jax.random.PRNGKey(0), x, valid)
    assert _rel(fused.apply(vs, x, valid), xla.apply(vs, x, valid)) < 1e-5
    assert _rel(train.apply(vs, x, valid), xla.apply(vs, x, valid)) < 1e-5

    def loss(p):
        return jnp.sum(train.apply(p, x, valid).astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(vs)
    gnorm = jnp.linalg.norm(grads["params"]["qkv"]["kernel"])
    assert float(gnorm) > 0


def test_ready_registry_and_disk_cache(monkeypatch, tmp_path):
    """ensure_probed_dpt_intra: probes once per shape, persists the
    winner, a later shape of the same config verifies instead of
    re-racing, and a fresh process loads from disk. Hermetic via
    CONVTASNET_AUTOTUNE_CACHE."""
    from convtasnet_tpu.config import ConvTasNetConfig

    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    cfg = ConvTasNetConfig(separator="dpt", bottleneck=128, dpt_chunk=16,
                           use_pallas=True)
    calls = []

    def fake_probe(**kw):
        calls.append(kw)
        key = (kw["M"], kw["n"], kw["S"], kw["B"], kw["n_heads"],
               str(jnp.dtype(kw["dtype"])))
        dpi._INTRA_READY[key] = 1
        return 1

    monkeypatch.setattr(dpi, "probe_fused_intra", fake_probe)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dpi, "_INTRA_READY", {})
    monkeypatch.setattr(dpi, "_INTRA_PROBED", set())
    monkeypatch.setattr(dpi, "_INTRA_CONFIG_WINNERS", {})

    T = 16 * 100 * cfg.stride
    dpi.ensure_probed_dpt_intra(cfg, 4, T, verbose=False)
    assert len(calls) == 1
    dpi.ensure_probed_dpt_intra(cfg, 4, T, verbose=False)   # idempotent
    assert len(calls) == 1

    # a different shape of the SAME config verifies the first winner
    dpi.ensure_probed_dpt_intra(cfg, 4, T * 2, verbose=False)
    assert len(calls) == 2
    assert calls[-1]["autotune"] is False
    assert calls[-1]["only_tile"] == 1

    # disk round trip: fresh registries, same shape -> loaded + verified
    monkeypatch.setattr(dpi, "_INTRA_READY", {})
    monkeypatch.setattr(dpi, "_INTRA_PROBED", set())
    monkeypatch.setattr(dpi, "_INTRA_CONFIG_WINNERS", {})
    dpi.ensure_probed_dpt_intra(cfg, 4, T, verbose=False)
    assert len(calls) == 3
    assert calls[-1]["autotune"] is False
    assert calls[-1]["only_tile"] == 1

    path = os.path.join(str(tmp_path), "autotune.json")
    with open(path) as f:
        data = json.load(f)
    assert any(k.startswith("dpt:intra:") for k in data["entries"])


def test_train_registry_and_disk_cache(monkeypatch, tmp_path):
    """ensure_probed_dpt_intra_train: races once per config, verifies
    later shapes, persists under dpt:intra-train: keys, and a fresh
    process loads from disk. Hermetic via CONVTASNET_AUTOTUNE_CACHE."""
    from convtasnet_tpu.config import ConvTasNetConfig

    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    cfg = ConvTasNetConfig(separator="dpt", bottleneck=128, dpt_chunk=16,
                           use_pallas=True)
    calls = []

    def fake_train_probe(**kw):
        calls.append(kw)
        key = (kw["M"], kw["n"], kw["S"], kw["B"], kw["n_heads"],
               str(jnp.dtype(kw["dtype"])))
        dpi._INTRA_BWD_READY[key] = True
        return True

    monkeypatch.setattr(dpi, "probe_fused_intra_train", fake_train_probe)
    monkeypatch.setattr(dpi, "ensure_probed_dpt_intra",
                        lambda *a, **k: None)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dpi, "_INTRA_BWD_READY", {})
    monkeypatch.setattr(dpi, "_INTRA_BWD_CONFIG", {})
    monkeypatch.setattr(dpi, "_INTRA_PROBED", set())

    T = 16 * 100 * cfg.stride
    dpi.ensure_probed_dpt_intra_train(cfg, 4, T, verbose=False)
    assert len(calls) == 1 and "autotune" not in calls[-1]
    dpi.ensure_probed_dpt_intra_train(cfg, 4, T, verbose=False)
    assert len(calls) == 1
    # another shape of the same config: compile+numerics verify, no race
    dpi.ensure_probed_dpt_intra_train(cfg, 4, T * 2, verbose=False)
    assert len(calls) == 2 and calls[-1]["autotune"] is False

    # fresh process: disk hit -> verify_only compile check
    monkeypatch.setattr(dpi, "_INTRA_BWD_READY", {})
    monkeypatch.setattr(dpi, "_INTRA_BWD_CONFIG", {})
    monkeypatch.setattr(dpi, "_INTRA_PROBED", set())
    dpi.ensure_probed_dpt_intra_train(cfg, 4, T, verbose=False)
    assert len(calls) == 3 and calls[-1]["verify_only"] is True

    path = os.path.join(str(tmp_path), "autotune.json")
    with open(path) as f:
        data = json.load(f)
    assert any(k.startswith("dpt:intra-train:") for k in data["entries"])
