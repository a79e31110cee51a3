"""In-model winner re-validation (ops/pallas/dpt_inmodel).

The sublayer probes race each fused DPT kernel in isolation; a Pallas call
is a fusion barrier whose full-model cost is batch-dependent, so
``validate_in_model`` re-times the real separator stack with each engaged
sublayer demoted to XLA and locks in demotions that measure faster. These
tests drive the greedy decision logic and its disk persistence with a fake
timer (no device timing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.ops.pallas import (
    dpt_attention as dpa,
    dpt_ffn as dpf,
    dpt_inmodel as dpm,
    dpt_intra as dpi,
)


def _cfg():
    return ConvTasNetConfig(separator="dpt", bottleneck=128, dpt_chunk=16,
                            use_pallas=True)


def _keys(cfg, batch, T):
    K = (T - cfg.kernel_size) // cfg.stride + 1
    S = cfg.dpt_chunk
    n = -(-K // S)
    B = cfg.bottleneck
    h = cfg.dpt_num_heads
    dt = str(jnp.dtype(cfg.compute_dtype))
    akey = (batch, n, S, B, h, dt)
    fkey = (batch, n * S, B, cfg.dpt_ff, dt)
    return akey, fkey


@pytest.fixture()
def tpu_registries(monkeypatch, tmp_path):
    """Fake-TPU environment with seeded registries and a tmp disk cache."""
    monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
    monkeypatch.setenv("CONVTASNET_INMODEL_RACE", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dpa, "_DPT_READY", {})
    monkeypatch.setattr(dpi, "_INTRA_READY", {})
    monkeypatch.setattr(dpf, "_FFN_READY", {})
    monkeypatch.setattr(dpa, "_DPT_BEST_FUSED", {})
    monkeypatch.setattr(dpi, "_INTRA_BEST_FUSED", {})
    monkeypatch.setattr(dpf, "_FFN_BEST_FUSED", {})
    monkeypatch.setattr(dpm, "_INMODEL_DONE", set())
    return tmp_path


def _fake_timer(monkeypatch, cost_fn):
    """Install a timer whose result is computed from the registry state."""
    calls = []

    def fake(cfg, batch, T, verbose):
        def measure():
            calls.append(1)
            return cost_fn()

        return measure

    monkeypatch.setattr(dpm, "_separator_timer", fake)
    return calls


def test_demotes_slower_sublayer_and_persists(monkeypatch, tpu_registries):
    cfg = _cfg()
    batch, T = 8, 16 * 100 * cfg.stride
    akey, fkey = _keys(cfg, batch, T)
    dpi._INTRA_READY[akey] = 5
    dpa._DPT_READY[akey] = 16
    dpf._FFN_READY[fkey] = 400

    # in-model truth: intra hurts (demoting it is 20% faster), others help
    def cost():
        t = 1.0
        if dpi._INTRA_READY.get(akey) is not None:
            t += 0.25
        if dpa._DPT_READY.get(akey) is None:
            t += 0.10
        if dpf._FFN_READY.get(fkey) is None:
            t += 0.10
        return t

    calls = _fake_timer(monkeypatch, cost)
    dpm.validate_in_model(cfg, batch, T, verbose=False)
    assert dpi._INTRA_READY[akey] is None          # demoted
    assert dpa._DPT_READY[akey] == 16              # kept
    assert dpf._FFN_READY[fkey] == 400             # kept
    # base + one demoted timing per engaged sublayer
    assert len(calls) == 4

    # idempotent in-process
    dpm.validate_in_model(cfg, batch, T, verbose=False)
    assert len(calls) == 4

    # fresh process (cleared memo + registries re-seeded with the same
    # raced winners): decision loads from disk, no timing at all
    monkeypatch.setattr(dpm, "_INMODEL_DONE", set())
    dpi._INTRA_READY[akey] = 5
    dpa._DPT_READY[akey] = 16
    dpf._FFN_READY[fkey] = 400
    dpm.validate_in_model(cfg, batch, T, verbose=False)
    assert len(calls) == 4
    assert dpi._INTRA_READY[akey] is None
    assert dpa._DPT_READY[akey] == 16


def test_promotes_isolated_race_loser(monkeypatch, tpu_registries):
    """A sublayer that lost its isolated race but speeds the full model
    gets promoted to its best fused tile, and the decision persists."""
    cfg = _cfg()
    batch, T = 32, 16 * 100 * cfg.stride
    akey, fkey = _keys(cfg, batch, T)
    dpi._INTRA_READY[akey] = None          # XLA won the isolated race
    dpi._INTRA_BEST_FUSED[akey] = 5        # ...but ct5 compiled + verified
    dpa._DPT_READY[akey] = 16              # engaged, helps

    def cost():
        t = 1.0
        if dpi._INTRA_READY.get(akey) is None:
            t += 0.12                      # in-model truth: fused helps
        if dpa._DPT_READY.get(akey) is None:
            t += 0.50
        return t

    calls = _fake_timer(monkeypatch, cost)
    dpm.validate_in_model(cfg, batch, T, verbose=False)
    assert dpi._INTRA_READY[akey] == 5     # promoted
    assert dpa._DPT_READY[akey] == 16      # kept
    # base + inter demotion try + intra promotion try
    assert len(calls) == 3

    # fresh process: raced winners re-seeded (no best_fused this time —
    # cache-loaded winners skip the race); decision loads from disk
    monkeypatch.setattr(dpm, "_INMODEL_DONE", set())
    monkeypatch.setattr(dpi, "_INTRA_BEST_FUSED", {})
    dpi._INTRA_READY[akey] = None
    dpa._DPT_READY[akey] = 16
    dpm.validate_in_model(cfg, batch, T, verbose=False)
    assert len(calls) == 3
    assert dpi._INTRA_READY[akey] == 5


def test_stale_disk_decision_revalidates(monkeypatch, tpu_registries):
    """A persisted decision only applies while the raced winner matches;
    a re-raced (different) winner triggers a fresh in-model validation."""
    cfg = _cfg()
    batch, T = 8, 16 * 100 * cfg.stride
    akey, fkey = _keys(cfg, batch, T)
    dpi._INTRA_READY[akey] = 5
    calls = _fake_timer(monkeypatch, lambda: 1.0)
    dpm.validate_in_model(cfg, batch, T, verbose=False)  # intra kept
    n0 = len(calls)
    assert dpi._INTRA_READY[akey] == 5

    # kernel re-raced to a new tile: stale decision must not apply
    monkeypatch.setattr(dpm, "_INMODEL_DONE", set())
    dpi._INTRA_READY[akey] = 7
    dpm.validate_in_model(cfg, batch, T, verbose=False)
    assert len(calls) > n0           # re-timed
    assert dpi._INTRA_READY[akey] == 7


def test_borderline_flip_jitter_spike_does_not_lock(monkeypatch,
                                                    tpu_registries):
    """A single flip sample inside the (margin, 2*margin] jitter band must
    be confirmed median-of-3; one spike no longer locks in the demotion."""
    cfg = _cfg()
    batch, T = 8, 16 * 100 * cfg.stride
    akey, _ = _keys(cfg, batch, T)
    dpi._INTRA_READY[akey] = 5
    # base, borderline flip sample (-4.5%), then two honest re-measures
    seq = iter([1.0, 0.955, 1.0, 1.0])
    calls = _fake_timer(monkeypatch, lambda: next(seq))
    dpm.validate_in_model(cfg, batch, T, verbose=False)
    assert dpi._INTRA_READY[akey] == 5     # spike rejected, winner kept
    assert len(calls) == 4                 # base + flip + 2 re-measures


def test_borderline_flip_confirmed_by_median(monkeypatch, tpu_registries):
    """A borderline win that reproduces across the median-of-3 locks in."""
    cfg = _cfg()
    batch, T = 8, 16 * 100 * cfg.stride
    akey, _ = _keys(cfg, batch, T)
    dpi._INTRA_READY[akey] = 5
    seq = iter([1.0, 0.955, 0.950, 0.960])   # median 0.955 < 0.97
    calls = _fake_timer(monkeypatch, lambda: next(seq))
    dpm.validate_in_model(cfg, batch, T, verbose=False)
    assert dpi._INTRA_READY[akey] is None  # demotion confirmed
    assert len(calls) == 4


def test_decisive_flip_skips_remeasure(monkeypatch, tpu_registries):
    """A win clearly past 2x the margin does not pay for re-measures."""
    cfg = _cfg()
    batch, T = 8, 16 * 100 * cfg.stride
    akey, _ = _keys(cfg, batch, T)
    dpi._INTRA_READY[akey] = 5

    def cost():
        return 1.0 if dpi._INTRA_READY.get(akey) is not None else 0.8

    calls = _fake_timer(monkeypatch, cost)
    dpm.validate_in_model(cfg, batch, T, verbose=False)
    assert dpi._INTRA_READY[akey] is None
    assert len(calls) == 2                 # base + one decisive flip


def test_noop_when_nothing_engaged(monkeypatch, tpu_registries):
    cfg = _cfg()
    batch, T = 8, 16 * 100 * cfg.stride

    def boom(*a, **k):
        raise AssertionError("timer must not be built")

    monkeypatch.setattr(dpm, "_separator_timer", boom)
    dpm.validate_in_model(cfg, batch, T, verbose=False)  # no winners seeded


def test_disabled_by_env(monkeypatch, tpu_registries):
    cfg = _cfg()
    batch, T = 8, 16 * 100 * cfg.stride
    akey, _ = _keys(cfg, batch, T)
    dpi._INTRA_READY[akey] = 5
    monkeypatch.setenv("CONVTASNET_INMODEL_RACE", "0")

    def boom(*a, **k):
        raise AssertionError("disabled: timer must not be built")

    monkeypatch.setattr(dpm, "_separator_timer", boom)
    dpm.validate_in_model(cfg, batch, T, verbose=False)
    assert dpi._INTRA_READY[akey] == 5


def test_timer_failure_keeps_raced_winners(monkeypatch, tpu_registries):
    cfg = _cfg()
    batch, T = 8, 16 * 100 * cfg.stride
    akey, _ = _keys(cfg, batch, T)
    dpi._INTRA_READY[akey] = 5

    def measure():
        raise RuntimeError("relay down")

    monkeypatch.setattr(dpm, "_separator_timer",
                        lambda *a, **k: measure)
    dpm.validate_in_model(cfg, batch, T, verbose=False)
    assert dpi._INTRA_READY[akey] == 5


def test_cpu_separator_timer_smoke():
    """The real timer builds and runs on CPU (tiny config) — guards the
    DualPathSeparator API the validator depends on."""
    cfg = ConvTasNetConfig(separator="dpt", n_filters=64, bottleneck=32,
                           dpt_layers=1, dpt_chunk=8, dpt_ff=64,
                           dpt_heads=2, use_pallas=False)
    T = 8 * 20 * cfg.stride
    timer = dpm._separator_timer(cfg, 2, T, verbose=False)
    assert timer is not None
    dt = timer()
    assert np.isfinite(dt) and dt > 0
