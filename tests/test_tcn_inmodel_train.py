"""In-model re-validation of the fused TCN train-pair winners
(ops/pallas/tcn_inmodel_train) — greedy decision logic, persistence, and
the reduced-repeat grad timer, all with a fake timer (no device)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.ops.pallas import tcn_block as tb
from convtasnet_tpu.ops.pallas import tcn_inmodel_train as tit


def _cfg(**kw):
    kw.setdefault("use_pallas", True)
    kw.setdefault("num_blocks", 3)  # dilations 1, 2, 4
    return ConvTasNetConfig(**kw)


@pytest.fixture()
def tpu_registries(monkeypatch, tmp_path):
    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    monkeypatch.setenv("CONVTASNET_INMODEL_RACE", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(tb, "_FUSED_BWD_READY", {})
    monkeypatch.setattr(tb, "_BWD_BEST_FUSED", {})
    monkeypatch.setattr(tit, "_INMODEL_DONE", set())
    return tmp_path


def _fake_timer(monkeypatch, cost_fn):
    calls = []

    def fake(cfg, batch, T, verbose):
        def measure():
            calls.append(1)
            return cost_fn()

        return measure

    monkeypatch.setattr(tit, "_r1_grad_timer", fake)
    return calls


def test_demotes_and_persists(monkeypatch, tpu_registries):
    cfg = _cfg()
    batch, T = 24, 32000
    k1 = (1, cfg.norm_type, cfg.causal)
    k2 = (2, cfg.norm_type, cfg.causal)
    tb._FUSED_BWD_READY[k1] = "store"
    tb._FUSED_BWD_READY[k2] = "store_f32"

    # in-model truth: d=1's pair hurts, d=2's helps
    def cost():
        t = 1.0
        if tb._FUSED_BWD_READY.get(k1) is not None:
            t += 0.2
        if tb._FUSED_BWD_READY.get(k2) is None:
            t += 0.2
        return t

    calls = _fake_timer(monkeypatch, cost)
    tit.validate_train_in_model(cfg, batch, T, verbose=False)
    assert tb._FUSED_BWD_READY[k1] is None
    assert tb._FUSED_BWD_READY[k2] == "store_f32"
    assert len(calls) == 3  # base + two demotion tries

    # idempotent in-process
    tit.validate_train_in_model(cfg, batch, T, verbose=False)
    assert len(calls) == 3

    # fresh process: same raced winners re-seeded -> disk decision applies
    monkeypatch.setattr(tit, "_INMODEL_DONE", set())
    tb._FUSED_BWD_READY[k1] = "store"
    tb._FUSED_BWD_READY[k2] = "store_f32"
    tit.validate_train_in_model(cfg, batch, T, verbose=False)
    assert len(calls) == 3
    assert tb._FUSED_BWD_READY[k1] is None
    assert tb._FUSED_BWD_READY[k2] == "store_f32"


def test_promotes_isolated_loser(monkeypatch, tpu_registries):
    """A dilation whose pair lost the isolated race but speeds the R=1
    stack in-model gets promoted to its numerics-verified best fused."""
    cfg = _cfg()
    batch, T = 24, 32000
    k1 = (1, cfg.norm_type, cfg.causal)
    tb._FUSED_BWD_READY[k1] = None
    tb._BWD_BEST_FUSED[k1] = "recompute"

    def cost():
        return 1.2 if tb._FUSED_BWD_READY.get(k1) is None else 1.0

    calls = _fake_timer(monkeypatch, cost)
    tit.validate_train_in_model(cfg, batch, T, verbose=False)
    assert tb._FUSED_BWD_READY[k1] == "recompute"
    assert len(calls) == 2  # base + promotion try


def test_stale_decision_revalidates(monkeypatch, tpu_registries):
    cfg = _cfg()
    batch, T = 24, 32000
    k1 = (1, cfg.norm_type, cfg.causal)
    tb._FUSED_BWD_READY[k1] = "store"
    calls = _fake_timer(monkeypatch, lambda: 1.0)
    tit.validate_train_in_model(cfg, batch, T, verbose=False)
    n0 = len(calls)
    assert tb._FUSED_BWD_READY[k1] == "store"

    monkeypatch.setattr(tit, "_INMODEL_DONE", set())
    tb._FUSED_BWD_READY[k1] = "recompute"  # re-raced to a different winner
    tit.validate_train_in_model(cfg, batch, T, verbose=False)
    assert len(calls) > n0
    assert tb._FUSED_BWD_READY[k1] == "recompute"


def test_noop_when_nothing_engaged(monkeypatch, tpu_registries):
    def boom(*a, **k):
        raise AssertionError("timer must not be built")

    monkeypatch.setattr(tit, "_r1_grad_timer", boom)
    tit.validate_train_in_model(_cfg(), 24, 32000, verbose=False)


def test_disabled_by_env(monkeypatch, tpu_registries):
    cfg = _cfg()
    k1 = (1, cfg.norm_type, cfg.causal)
    tb._FUSED_BWD_READY[k1] = "store"
    monkeypatch.setenv("CONVTASNET_INMODEL_RACE", "0")

    def boom(*a, **k):
        raise AssertionError("disabled: timer must not be built")

    monkeypatch.setattr(tit, "_r1_grad_timer", boom)
    tit.validate_train_in_model(cfg, 24, 32000, verbose=False)
    assert tb._FUSED_BWD_READY[k1] == "store"


def test_timer_failure_keeps_winners(monkeypatch, tpu_registries):
    cfg = _cfg()
    k1 = (1, cfg.norm_type, cfg.causal)
    tb._FUSED_BWD_READY[k1] = "store"

    def measure():
        raise RuntimeError("relay down")

    monkeypatch.setattr(tit, "_r1_grad_timer", lambda *a, **k: measure)
    tit.validate_train_in_model(cfg, 24, 32000, verbose=False)
    assert tb._FUSED_BWD_READY[k1] == "store"


def test_cpu_r1_grad_timer_smoke():
    """The real reduced-repeat grad timer builds and runs on CPU with a
    tiny XLA-path config — guards the TemporalConvNet API it depends on."""
    cfg = ConvTasNetConfig(n_filters=32, bottleneck=16, hidden=24,
                           num_blocks=2, num_repeats=2, use_pallas=False)
    T = 16 * 40 * cfg.stride
    timer = tit._r1_grad_timer(cfg, 2, T, verbose=False)
    assert timer is not None
    dt = timer()
    assert np.isfinite(dt) and dt > 0
