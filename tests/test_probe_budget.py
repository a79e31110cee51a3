"""Probe wall-clock budget (ops/pallas/probe_budget) — deadline safety of
the autotune chain.

Round-4 postmortem: a cold autotune cache made the probe/race chain outlast
the driver's bench timeout (BENCH_r04 rc=124, no throughput line). The
budget is the backstop: once exhausted, remaining dilations/pairs/sublayers
stay on the XLA path FOR THIS RUN, nothing bogus is recorded or persisted,
and partial race results accumulate on disk across runs.
"""

import json

import jax
import jax.numpy as jnp

from convtasnet_tpu.ops.pallas import probe_budget


def _fresh(monkeypatch, seconds):
    monkeypatch.setenv("CONVTASNET_PROBE_BUDGET", str(seconds))
    probe_budget.reset()


class TestBudgetModule:
    def test_default_and_env(self, monkeypatch):
        _fresh(monkeypatch, 123.0)
        probe_budget.begin()
        assert 0 < probe_budget.remaining() <= 123.0
        assert not probe_budget.exhausted()
        probe_budget.reset()

    def test_zero_means_unlimited(self, monkeypatch):
        _fresh(monkeypatch, 0)
        assert probe_budget.remaining() == float("inf")
        assert not probe_budget.exhausted()
        probe_budget.reset()

    def test_exhaustion(self, monkeypatch):
        _fresh(monkeypatch, 0)
        probe_budget.begin(1e-9)
        assert probe_budget.exhausted()
        probe_budget.begin(60)  # re-arming clears the exhaustion
        assert not probe_budget.exhausted()
        probe_budget.reset()

    def test_bad_env_falls_back_to_default(self, monkeypatch):
        monkeypatch.setenv("CONVTASNET_PROBE_BUDGET", "not-a-number")
        probe_budget.reset()
        probe_budget.begin()
        r = probe_budget.remaining()
        assert 0 < r <= probe_budget.DEFAULT_BUDGET_S
        probe_budget.reset()


class TestRaceGating:
    def test_time_or_none_short_circuits_when_exhausted(self, monkeypatch):
        from convtasnet_tpu.ops.pallas import tcn_block as tb

        _fresh(monkeypatch, 0)
        probe_budget.begin(1e-9)
        try:
            def boom(_x):
                raise AssertionError("must not be traced/timed")

            assert tb._time_or_none(boom, jnp.zeros((2, 2))) is None
        finally:
            probe_budget.reset()

    def test_race_returns_no_decision_when_exhausted(self, monkeypatch):
        from convtasnet_tpu.ops.pallas import tcn_block as tb

        _fresh(monkeypatch, 0)
        probe_budget.begin(1e-9)
        try:
            def boom(_x):
                raise AssertionError("must not run")

            best, timed = tb._race({"a": boom}, boom, jnp.zeros((2, 2)),
                                   inner=10)
            assert best is None
            assert not any(k != "xla" for k in timed)
        finally:
            probe_budget.reset()

    def test_race_times_xla_baseline_first(self, monkeypatch):
        """Mid-race exhaustion must still compare against the baseline, so
        the baseline is timed before any candidate."""
        from convtasnet_tpu.ops.pallas import tcn_block as tb

        _fresh(monkeypatch, 0)
        order = []

        def fake_time(fn, x, inner=150, retries=1):
            order.append(fn.__name__)
            return 1.0

        monkeypatch.setattr(tb, "_time_or_none", fake_time)

        def xla_fn(x):
            return x

        def cand(x):
            return x

        tb._race({"cand": cand}, xla_fn, jnp.zeros((2, 2)), inner=10)
        assert order[0] == "xla_fn"
        probe_budget.reset()


class TestProbeGating:
    def test_probe_skips_unrecorded_when_exhausted(self, monkeypatch):
        """Race mode + exhausted budget: nothing compiled, nothing recorded
        (the dilation is absent from results and the registry), so a fresh
        budget re-races it."""
        from convtasnet_tpu.ops.pallas import tcn_block as tb

        _fresh(monkeypatch, 0)
        probe_budget.begin(1e-9)
        saved = dict(tb._FUSED_READY)
        try:
            res = tb.probe_fused_block(
                [7], K=40, batch=2, bottleneck=8, hidden=16,
                norm_type="gLN", causal=False, dtype=jnp.float32,
                tile=48, interpret=False, verbose=False)
            assert res == {}
            assert (7, "gLN", False) not in tb._FUSED_READY
        finally:
            probe_budget.reset()
            tb._FUSED_READY.clear()
            tb._FUSED_READY.update(saved)

    def test_probe_verify_demotes_when_exhausted(self, monkeypatch):
        """Verify mode + exhausted budget: the recorded winner cannot be
        compile-proven at this shape, so it must demote to XLA (an unproven
        compile inside the model's jit would have no per-block fallback)."""
        from convtasnet_tpu.ops.pallas import tcn_block as tb

        _fresh(monkeypatch, 0)
        probe_budget.begin(1e-9)
        saved = dict(tb._FUSED_READY)
        try:
            tb._FUSED_READY[(7, "gLN", False)] = "store"
            res = tb.probe_fused_block(
                [7], K=40, batch=2, bottleneck=8, hidden=16,
                norm_type="gLN", causal=False, dtype=jnp.float32,
                tile=48, interpret=False, verbose=False, verify_only=True)
            assert res == {7: None}
            assert tb._FUSED_READY[(7, "gLN", False)] is None
        finally:
            probe_budget.reset()
            tb._FUSED_READY.clear()
            tb._FUSED_READY.update(saved)

    def test_train_probe_skips_unrecorded_when_exhausted(self, monkeypatch):
        from convtasnet_tpu.ops.pallas import tcn_block as tb

        _fresh(monkeypatch, 0)
        probe_budget.begin(1e-9)
        saved = dict(tb._FUSED_BWD_READY)
        try:
            res = tb.probe_fused_block_train(
                [7], K=40, batch=2, bottleneck=8, hidden=16,
                norm_type="gLN", causal=False, dtype=jnp.float32,
                tile=48, interpret=False, verbose=False)
            assert res == {}
            assert (7, "gLN", False) not in tb._FUSED_BWD_READY
        finally:
            probe_budget.reset()
            tb._FUSED_BWD_READY.clear()
            tb._FUSED_BWD_READY.update(saved)

    def test_pair_probe_skips_unrecorded_when_exhausted(self, monkeypatch):
        from convtasnet_tpu.ops.pallas import tcn_block_pair as tbp

        _fresh(monkeypatch, 0)
        probe_budget.begin(1e-9)
        saved = dict(tbp._FUSED_PAIR_READY)
        try:
            res = tbp.probe_fused_block_pairs(
                [(1, 2)], K=40, batch=2, bottleneck=8, hidden=16,
                norm_type="gLN", causal=False, dtype=jnp.float32,
                tile=48, interpret=False, verbose=False)
            assert res == {}
            assert (1, 2, "gLN", False) not in tbp._FUSED_PAIR_READY
        finally:
            probe_budget.reset()
            tbp._FUSED_PAIR_READY.clear()
            tbp._FUSED_PAIR_READY.update(saved)


class TestEnsureProbedBudget:
    def _cfg(self):
        from convtasnet_tpu.config import ConvTasNetConfig

        return ConvTasNetConfig(use_pallas=True, num_blocks=2)

    def test_budget_cut_is_not_memoized(self, monkeypatch, tmp_path):
        """A budget-cut ensure_probed must not mark the shape/config as
        probed: the next call (fresh budget) finishes the job."""
        from convtasnet_tpu.ops.pallas import tcn_block as tb

        monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        _fresh(monkeypatch, 0)
        calls = []

        def fake_probe(cfg, K, batch, verbose=False, verify_only=False,
                       dilations=None):
            calls.append((verify_only, tuple(dilations or (1, 2))))
            if probe_budget.exhausted():
                return {}  # budget-cut probe records nothing
            out = {d: "store" for d in (dilations or (1, 2))}
            for d in out:
                tb._FUSED_READY[(d, cfg.norm_type, cfg.causal)] = "store"
            return out

        monkeypatch.setattr(tb, "probe_for_config", fake_probe)
        saved = (dict(tb._FUSED_READY), set(tb._PROBED_SHAPES),
                 set(tb._PROBED_CONFIGS))
        try:
            tb._FUSED_READY.clear()
            tb._PROBED_SHAPES.clear()
            tb._PROBED_CONFIGS.clear()
            cfg = self._cfg()
            probe_budget.begin(1e-9)  # already exhausted
            tb.ensure_probed(cfg, 8, 32000, verbose=False)
            assert not tb._PROBED_SHAPES and not tb._PROBED_CONFIGS
            probe_budget.begin(60)  # fresh budget: finishes the job
            tb.ensure_probed(cfg, 8, 32000, verbose=False)
            assert tb._PROBED_SHAPES and tb._PROBED_CONFIGS
            assert [c[0] for c in calls] == [False, False]
        finally:
            probe_budget.reset()
            tb._FUSED_READY.clear()
            tb._FUSED_READY.update(saved[0])
            tb._PROBED_SHAPES.clear()
            tb._PROBED_SHAPES.update(saved[1])
            tb._PROBED_CONFIGS.clear()
            tb._PROBED_CONFIGS.update(saved[2])

    def test_partial_disk_entry_races_only_missing(self, monkeypatch,
                                                   tmp_path):
        """A partial autotune entry (stored by a budget-cut run) verifies
        the cached dilations and races only the missing ones; the new
        results merge into the same disk entry."""
        from convtasnet_tpu.ops.pallas import tcn_block as tb

        monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        _fresh(monkeypatch, 0)
        calls = []

        def fake_probe(cfg, K, batch, verbose=False, verify_only=False,
                       dilations=None):
            calls.append((verify_only, tuple(dilations)))
            return {d: "store" for d in dilations}

        monkeypatch.setattr(tb, "probe_for_config", fake_probe)
        saved = (dict(tb._FUSED_READY), set(tb._PROBED_SHAPES),
                 set(tb._PROBED_CONFIGS))
        try:
            tb._FUSED_READY.clear()
            tb._PROBED_SHAPES.clear()
            tb._PROBED_CONFIGS.clear()
            cfg = self._cfg()
            K = (32000 - cfg.kernel_size) // cfg.stride + 1
            disk_key = "fwd:" + ":".join(str(x) for x in (
                (8, K, cfg.bottleneck, cfg.hidden, cfg.conv_kernel,
                 cfg.num_blocks, cfg.norm_type, cfg.causal,
                 cfg.compute_dtype)))
            # simulate a budget-cut run that only raced dilation 1
            tb._autotune_cache_store(disk_key, {1: "recompute"})
            tb.ensure_probed(cfg, 8, 32000, verbose=False)
            assert calls == [(True, (1,)), (False, (2,))]
            assert tb._FUSED_READY[(1, "gLN", False)] == "recompute"
            entry = tb._autotune_cache_load()[disk_key]
            assert entry == {"1": "recompute", "2": "store"}
        finally:
            probe_budget.reset()
            tb._FUSED_READY.clear()
            tb._FUSED_READY.update(saved[0])
            tb._PROBED_SHAPES.clear()
            tb._PROBED_SHAPES.update(saved[1])
            tb._PROBED_CONFIGS.clear()
            tb._PROBED_CONFIGS.update(saved[2])

    def test_autotune_store_merges_entries(self, monkeypatch, tmp_path):
        from convtasnet_tpu.ops.pallas import tcn_block as tb

        monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
        tb._autotune_cache_store("k", {1: "a"})
        tb._autotune_cache_store("k", {2: None})
        assert tb._autotune_cache_load()["k"] == {"1": "a", "2": None}
        with open(tmp_path / "autotune.json") as f:
            assert json.load(f)["entries"]["k"] == {"1": "a", "2": None}


class TestDptEnsureGate:
    def test_dpt_ensure_is_noop_when_exhausted(self, monkeypatch, tmp_path):
        """With the budget exhausted, the DPT sublayer ensure functions
        return before probing, persisting, or memoizing anything."""
        from convtasnet_tpu.config import ConvTasNetConfig
        from convtasnet_tpu.ops.pallas import dpt_attention as da
        from convtasnet_tpu.ops.pallas import dpt_ffn as df
        from convtasnet_tpu.ops.pallas import dpt_intra as di
        from convtasnet_tpu.ops.pallas import tcn_block as tb

        monkeypatch.setenv("CONVTASNET_AUTOTUNE_CACHE", str(tmp_path))
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        _fresh(monkeypatch, 0)
        probe_budget.begin(1e-9)
        saved = (set(da._DPT_PROBED), set(di._INTRA_PROBED),
                 set(df._FFN_PROBED))
        try:
            cfg = ConvTasNetConfig(separator="dpt", use_pallas=True)
            da.ensure_probed_dpt(cfg, 8, 32000, verbose=False)
            da.ensure_probed_dpt_train(cfg, 8, 32000, verbose=False)
            assert set(da._DPT_PROBED) == saved[0]
            assert set(di._INTRA_PROBED) == saved[1]
            assert set(df._FFN_PROBED) == saved[2]
            assert tb._autotune_cache_load() == {}
        finally:
            probe_budget.reset()
