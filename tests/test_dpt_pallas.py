"""Fused dual-path inter-attention kernel vs the XLA sublayer.

Three trust layers (interpret mode on CPU):
1. the Pallas kernel computes ``xla_inter_attention`` (pad masks, both
   dtypes, tile variants);
2. ``xla_inter_attention`` stays in sync with the flax
   ``_AttentionSublayer`` (the probe's numerics reference must be the
   real model math);
3. the in-model gate: inference engages the kernel, training does not
   (autodiff must flow through the XLA ops), and the registry/disk cache
   behave hermetically.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convtasnet_tpu.ops.pallas import dpt_attention as dpa


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
    bias = jnp.asarray(np.where(valid, 0.0, dpa.NEG_INF), jnp.float32)
    return x, (gamma, beta, w_qkv, w_out, bias), jnp.asarray(valid)


def _rel(got, want):
    g = np.asarray(got, np.float32).ravel()
    w = np.asarray(want, np.float32).ravel()
    return float(np.linalg.norm(g - w) / (np.linalg.norm(w) + 1e-12))


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("shape", [(2, 5, 32, 128, 4), (1, 7, 64, 256, 8)])
def test_kernel_matches_xla(shape, dtype, tol):
    M, n, S, B, h = shape
    x, args, _ = _mk(M, n, S, B, h, dtype)
    want = dpa.xla_inter_attention(x, *args, n_heads=h)
    for st in (None, S // 2):
        got = dpa.fused_inter_attention(x, *args, n_heads=h, s_tile=st,
                                        interpret=True)
        assert got.dtype == x.dtype
        assert _rel(got, want) < tol


def test_kernel_no_mask():
    M, n, S, B, h = 2, 4, 16, 128, 4
    x, (g, b, wq, wo, _), _ = _mk(M, n, S, B, h, jnp.float32, pad=False)
    want = dpa.xla_inter_attention(x, g, b, wq, wo, None, n_heads=h)
    got = dpa.fused_inter_attention(x, g, b, wq, wo, None, n_heads=h,
                                    interpret=True)
    assert _rel(got, want) < 1e-5


def test_pad_content_invariance():
    """Masked key chunks must not influence valid outputs (the separator
    relies on this: padded tail frames carry arbitrary values)."""
    M, n, S, B, h = 1, 4, 16, 128, 4
    x, args, valid = _mk(M, n, S, B, h, jnp.float32)
    out1 = dpa.fused_inter_attention(x, *args, n_heads=h, interpret=True)
    x2 = jnp.where(valid[None, :, :, None], x, 37.0)
    out2 = dpa.fused_inter_attention(x2, *args, n_heads=h, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out1)[0][np.asarray(valid)],
        np.asarray(out2)[0][np.asarray(valid)], rtol=2e-5, atol=2e-5)


def test_xla_ref_matches_flax_sublayer():
    """The probe's numerics reference IS the model math (guards drift)."""
    from convtasnet_tpu.models.dual_path import _AttentionSublayer

    M, n, S, B, h = 2, 5, 32, 128, 4
    x, (g, b, wq, wo, bias), valid = _mk(M, n, S, B, h, jnp.float32)
    mod = _AttentionSublayer(B, h, attend_axis=1, train=True)  # XLA path
    vs = {"params": {"norm": {"gamma": g, "beta": b},
                     "qkv": {"kernel": wq}, "out": {"kernel": wo}}}
    want = mod.apply(vs, x, valid)
    got = dpa.xla_inter_attention(x, g, b, wq, wo, bias, n_heads=h)
    assert _rel(got, want) < 1e-6


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-4),
                                       (jnp.bfloat16, 4e-2)])
def test_fused_vjp_matches_autodiff(dtype, tol):
    """The fused single-kernel backward reproduces every XLA-autodiff
    cotangent (dx, dgamma, dbeta, dW_qkv, dW_out) — the training-path
    trust gate, in interpret mode."""
    M, n, S, B, h = 2, 5, 32, 128, 4
    x, (g, b, wq, wo, bias), _ = _mk(M, n, S, B, h, dtype, seed=3)

    def loss_of(fn):
        def f(x_, g_, b_, wq_, wo_):
            return jnp.sum(fn(x_, g_, b_, wq_, wo_).astype(jnp.float32) ** 2)

        return f

    fused = loss_of(lambda *a: dpa.fused_inter_attention_ad(
        *a, bias, n_heads=h, bwd=True, interpret=True))
    ref = loss_of(lambda *a: dpa.xla_inter_attention(*a, bias, n_heads=h))
    got = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(x, g, b, wq, wo)
    want = jax.grad(ref, argnums=(0, 1, 2, 3, 4))(x, g, b, wq, wo)
    for name, g_, w_ in zip(["dx", "dgamma", "dbeta", "dwqkv", "dwout"],
                            got, want):
        assert _rel(g_, w_) < tol, name
    assert got[0].dtype == x.dtype


def test_sublayer_gate_engages_for_inference_only():
    """On CPU the registry reports ready (interpret): inference returns
    the forward kernel's output, training the custom-VJP pair's —
    numerically equal, and gradients must flow through the training
    path."""
    from convtasnet_tpu.models.dual_path import _AttentionSublayer

    M, n, S, B, h = 2, 4, 16, 128, 4
    x, _, valid = _mk(M, n, S, B, h, jnp.float32)
    infer = _AttentionSublayer(B, h, attend_axis=1, train=False)
    train = _AttentionSublayer(B, h, attend_axis=1, train=True)
    vs = train.init(jax.random.PRNGKey(0), x, valid)
    assert _rel(infer.apply(vs, x, valid), train.apply(vs, x, valid)) < 1e-5

    def loss(p):
        return jnp.sum(train.apply(p, x, valid).astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(vs)
    gnorm = jnp.linalg.norm(grads["params"]["qkv"]["kernel"])
    assert float(gnorm) > 0


def test_separator_inference_matches_training_forward():
    """Full DualPathSeparator: the fused inference forward equals the
    training forward (same params, no dropout anywhere)."""
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.dual_path import DualPathSeparator

    cfg = ConvTasNetConfig(separator="dpt", n_filters=64, bottleneck=128,
                           dpt_layers=2, dpt_chunk=16, dpt_ff=128,
                           num_speakers=2, use_pallas=True)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((2, 50, 64)), jnp.float32)
    mod = DualPathSeparator(cfg)
    vs = mod.init(jax.random.PRNGKey(0), w)
    got = mod.apply(vs, w, train=False)
    want = mod.apply(vs, w, train=True)
    assert _rel(got, want) < 1e-5


def test_ready_registry_and_disk_cache(monkeypatch, tmp_path):
    """ensure_probed_dpt: probes once per shape, persists the winner, and
    a fresh process (cleared registry) loads it from disk instead of
    re-racing. Hermetic via CONVTASNET_AUTOTUNE_CACHE."""
    from convtasnet_tpu.config import ConvTasNetConfig

    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    # the cache path helper lives in tcn_block; clear its env fingerprint
    # memo so it re-reads the env var... (path is computed per call)
    cfg = ConvTasNetConfig(separator="dpt", bottleneck=128, dpt_chunk=16,
                           use_pallas=True)
    calls = []

    def fake_probe(**kw):
        calls.append(kw)
        key = (kw["M"], kw["n"], kw["S"], kw["B"], kw["n_heads"],
               str(jnp.dtype(kw["dtype"])))
        dpa._DPT_READY[key] = 16
        return 16

    monkeypatch.setattr(dpa, "probe_fused_inter", fake_probe)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dpa, "_DPT_READY", {})
    monkeypatch.setattr(dpa, "_DPT_PROBED", set())
    monkeypatch.setattr(dpa, "_DPT_CONFIG_WINNERS", {})

    T = 16 * 100 * cfg.stride
    dpa.ensure_probed_dpt(cfg, 4, T, verbose=False)
    assert len(calls) == 1
    dpa.ensure_probed_dpt(cfg, 4, T, verbose=False)   # idempotent
    assert len(calls) == 1

    # a different shape of the SAME config verifies the first winner
    # (only_tile) instead of re-racing
    dpa.ensure_probed_dpt(cfg, 4, T * 2, verbose=False)
    assert len(calls) == 2
    assert calls[-1]["autotune"] is False
    assert calls[-1]["only_tile"] == 16

    # disk round trip: fresh registries, same shape -> loaded, winner
    # verified via only_tile (autotune=False)
    monkeypatch.setattr(dpa, "_DPT_READY", {})
    monkeypatch.setattr(dpa, "_DPT_PROBED", set())
    monkeypatch.setattr(dpa, "_DPT_CONFIG_WINNERS", {})
    dpa.ensure_probed_dpt(cfg, 4, T, verbose=False)
    assert len(calls) == 3
    assert calls[-1]["autotune"] is False
    assert calls[-1]["only_tile"] == 16

    path = os.path.join(str(tmp_path), "autotune.json")
    with open(path) as f:
        data = json.load(f)
    assert any(k.startswith("dpt:inter:") for k in data["entries"])


def test_train_registry_and_disk_cache(monkeypatch, tmp_path):
    """ensure_probed_dpt_train: races once per config, verifies later
    shapes, persists the winner under dpt:train: keys, and a fresh
    process loads it from disk. Hermetic via CONVTASNET_AUTOTUNE_CACHE."""
    from convtasnet_tpu.config import ConvTasNetConfig

    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    cfg = ConvTasNetConfig(separator="dpt", bottleneck=128, dpt_chunk=16,
                           use_pallas=True)
    calls = []

    def fake_train_probe(**kw):
        calls.append(kw)
        key = (kw["M"], kw["n"], kw["S"], kw["B"], kw["n_heads"],
               str(jnp.dtype(kw["dtype"])))
        dpa._DPT_BWD_READY[key] = True
        return True

    monkeypatch.setattr(dpa, "probe_fused_inter_train", fake_train_probe)
    monkeypatch.setattr(dpa, "ensure_probed_dpt", lambda *a, **k: None)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dpa, "_DPT_BWD_READY", {})
    monkeypatch.setattr(dpa, "_DPT_BWD_CONFIG", {})
    monkeypatch.setattr(dpa, "_DPT_PROBED", set())

    T = 16 * 100 * cfg.stride
    dpa.ensure_probed_dpt_train(cfg, 4, T, verbose=False)
    assert len(calls) == 1 and "autotune" not in calls[-1]
    dpa.ensure_probed_dpt_train(cfg, 4, T, verbose=False)  # idempotent
    assert len(calls) == 1
    # another shape of the same config: compile+numerics verify, no race
    dpa.ensure_probed_dpt_train(cfg, 4, T * 2, verbose=False)
    assert len(calls) == 2 and calls[-1]["autotune"] is False

    # fresh process: disk hit -> verify_only compile check
    monkeypatch.setattr(dpa, "_DPT_BWD_READY", {})
    monkeypatch.setattr(dpa, "_DPT_BWD_CONFIG", {})
    monkeypatch.setattr(dpa, "_DPT_PROBED", set())
    dpa.ensure_probed_dpt_train(cfg, 4, T, verbose=False)
    assert len(calls) == 3 and calls[-1]["verify_only"] is True

    path = os.path.join(str(tmp_path), "autotune.json")
    with open(path) as f:
        data = json.load(f)
    assert any(k.startswith("dpt:train:") for k in data["entries"])
