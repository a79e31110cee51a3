"""In-model re-validation of the fused TCN pair winners
(ops/pallas/tcn_inmodel_fwd) — greedy decision logic, persistence, and the
full-separator timer, all with a fake timer (no device)."""

import jax
import numpy as np
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.ops.pallas import tcn_block_pair as tbp
from convtasnet_tpu.ops.pallas import tcn_inmodel_fwd as tif


def _cfg(**kw):
    kw.setdefault("use_pallas", True)
    kw.setdefault("num_blocks", 4)  # pairs (1,2) and (4,8)
    return ConvTasNetConfig(**kw)


@pytest.fixture()
def tpu_registries(monkeypatch, tmp_path):
    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    monkeypatch.setenv("CONVTASNET_INMODEL_RACE", "1")
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(tbp, "_FUSED_PAIR_READY", {})
    monkeypatch.setattr(tbp, "_PAIR_BEST_FUSED", {})
    monkeypatch.setattr(tif, "_INMODEL_DONE", set())
    return tmp_path


def _fake_timer(monkeypatch, cost_fn):
    calls = []

    def fake(cfg, batch, T, verbose):
        def measure():
            calls.append(1)
            return cost_fn()

        return measure

    monkeypatch.setattr(tif, "_separator_timer", fake)
    return calls


def test_demotes_regressing_pair_and_persists(monkeypatch, tpu_registries):
    """The measured round-4 failure mode: both pairs win isolated yet one
    regresses the full forward — it must demote, the other stay."""
    cfg = _cfg()
    batch, T = 8, 32000
    k12 = (1, 2, cfg.norm_type, cfg.causal)
    k48 = (4, 8, cfg.norm_type, cfg.causal)
    tbp._FUSED_PAIR_READY[k12] = "pair_f32"
    tbp._FUSED_PAIR_READY[k48] = "pair"

    def cost():
        t = 1.0
        if tbp._FUSED_PAIR_READY.get(k12) is not None:
            t += 0.2  # (1,2) pair hurts in-model
        if tbp._FUSED_PAIR_READY.get(k48) is None:
            t += 0.2  # (4,8) pair genuinely helps
        return t

    calls = _fake_timer(monkeypatch, cost)
    tif.validate_pairs_in_model(cfg, batch, T, verbose=False)
    assert tbp._FUSED_PAIR_READY[k12] is None
    assert tbp._FUSED_PAIR_READY[k48] == "pair"
    assert len(calls) == 3  # base + two demotion tries

    # idempotent in-process
    tif.validate_pairs_in_model(cfg, batch, T, verbose=False)
    assert len(calls) == 3

    # fresh process: same raced winners re-seeded -> disk decision applies
    monkeypatch.setattr(tif, "_INMODEL_DONE", set())
    tbp._FUSED_PAIR_READY[k12] = "pair_f32"
    tbp._FUSED_PAIR_READY[k48] = "pair"
    tif.validate_pairs_in_model(cfg, batch, T, verbose=False)
    assert len(calls) == 3
    assert tbp._FUSED_PAIR_READY[k12] is None
    assert tbp._FUSED_PAIR_READY[k48] == "pair"


def test_promotes_isolated_loser(monkeypatch, tpu_registries):
    cfg = _cfg()
    batch, T = 8, 32000
    k12 = (1, 2, cfg.norm_type, cfg.causal)
    tbp._FUSED_PAIR_READY[k12] = None
    tbp._PAIR_BEST_FUSED[k12] = "pair_f32@800"

    def cost():
        return 1.2 if tbp._FUSED_PAIR_READY.get(k12) is None else 1.0

    calls = _fake_timer(monkeypatch, cost)
    tif.validate_pairs_in_model(cfg, batch, T, verbose=False)
    assert tbp._FUSED_PAIR_READY[k12] == "pair_f32@800"
    assert len(calls) == 2  # base + promotion try


def test_stale_decision_revalidates(monkeypatch, tpu_registries):
    cfg = _cfg()
    batch, T = 8, 32000
    k12 = (1, 2, cfg.norm_type, cfg.causal)
    tbp._FUSED_PAIR_READY[k12] = "pair"
    calls = _fake_timer(monkeypatch, lambda: 1.0)
    tif.validate_pairs_in_model(cfg, batch, T, verbose=False)
    n0 = len(calls)
    assert tbp._FUSED_PAIR_READY[k12] == "pair"

    monkeypatch.setattr(tif, "_INMODEL_DONE", set())
    tbp._FUSED_PAIR_READY[k12] = "pair_f32"  # re-raced, different winner
    tif.validate_pairs_in_model(cfg, batch, T, verbose=False)
    assert len(calls) > n0
    assert tbp._FUSED_PAIR_READY[k12] == "pair_f32"


def test_noop_when_nothing_engaged(monkeypatch, tpu_registries):
    def boom(*a, **k):
        raise AssertionError("timer must not be built")

    monkeypatch.setattr(tif, "_separator_timer", boom)
    tif.validate_pairs_in_model(_cfg(), 8, 32000, verbose=False)


def test_disabled_by_env(monkeypatch, tpu_registries):
    cfg = _cfg()
    k12 = (1, 2, cfg.norm_type, cfg.causal)
    tbp._FUSED_PAIR_READY[k12] = "pair"
    monkeypatch.setenv("CONVTASNET_INMODEL_RACE", "0")

    def boom(*a, **k):
        raise AssertionError("disabled: timer must not be built")

    monkeypatch.setattr(tif, "_separator_timer", boom)
    tif.validate_pairs_in_model(cfg, 8, 32000, verbose=False)
    assert tbp._FUSED_PAIR_READY[k12] == "pair"


def test_pair_fusion_off_disables(monkeypatch, tpu_registries):
    cfg = _cfg()
    k12 = (1, 2, cfg.norm_type, cfg.causal)
    tbp._FUSED_PAIR_READY[k12] = "pair"
    monkeypatch.setenv("CONVTASNET_PAIR_FUSION", "0")

    def boom(*a, **k):
        raise AssertionError("pair fusion off: timer must not be built")

    monkeypatch.setattr(tif, "_separator_timer", boom)
    tif.validate_pairs_in_model(cfg, 8, 32000, verbose=False)


def test_timer_failure_keeps_winners(monkeypatch, tpu_registries):
    cfg = _cfg()
    k12 = (1, 2, cfg.norm_type, cfg.causal)
    tbp._FUSED_PAIR_READY[k12] = "pair"

    def measure():
        raise RuntimeError("relay down")

    monkeypatch.setattr(tif, "_separator_timer", lambda *a, **k: measure)
    tif.validate_pairs_in_model(cfg, 8, 32000, verbose=False)
    assert tbp._FUSED_PAIR_READY[k12] == "pair"


def test_cpu_separator_timer_smoke():
    """The real full-separator timer builds and runs on CPU with a tiny
    XLA-path config — guards the TemporalConvNet API it depends on."""
    cfg = ConvTasNetConfig(n_filters=32, bottleneck=16, hidden=24,
                           num_blocks=2, num_repeats=2, use_pallas=False)
    T = 16 * 40 * cfg.stride
    timer = tif._separator_timer(cfg, 2, T, verbose=False)
    assert timer is not None
    dt = timer()
    assert np.isfinite(dt) and dt > 0
