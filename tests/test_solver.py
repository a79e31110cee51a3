"""Solver state-machine tests: LR halving / early stopping (parity with the
reference's rules, ``src/solver.py:115-133``), best-model tracking, and
preemption checkpointing — driven with a stubbed eval step so validation
losses follow a script."""

import os
import signal

import numpy as np

from convtasnet_tpu.config import (
    ConvTasNetConfig, DataConfig, SolverConfig, TrainConfig)
from convtasnet_tpu.train.solver import Solver
from convtasnet_tpu.train.train_step import get_lr

TINY = ConvTasNetConfig(
    n_filters=16, kernel_size=8, bottleneck=12, hidden=24, conv_kernel=3,
    num_blocks=2, num_repeats=1, num_speakers=2)


class FakeLoader:
    """Yields a fixed list of random batches."""

    def __init__(self, n_batches=2, B=2, T=800, seed=0):
        rng = np.random.default_rng(seed)
        import jax.numpy as jnp
        self.batches = [
            (jnp.asarray(rng.standard_normal((B, T)), jnp.float32),
             jnp.full((B,), T, jnp.int32),
             jnp.asarray(rng.standard_normal((B, 2, T)), jnp.float32),
             jnp.ones((B,), jnp.float32))
            for _ in range(n_batches)]

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, e):
        pass


def _solver(tmp_path, epochs=10, cv_script=None, **solver_kw):
    cfg = TrainConfig(
        model=TINY, data=DataConfig(segment=0.1, batch_size=2),
        solver=SolverConfig(epochs=epochs, lr=1e-3, print_freq=1000,
                            save_folder=str(tmp_path / "exp"), **solver_kw))
    s = Solver(cfg, FakeLoader(), FakeLoader(n_batches=1))
    if cv_script is not None:
        script = list(cv_script)
        s._run_cv_epoch = lambda epoch: script[epoch]
    return s


def test_lr_halves_after_three_bad_epochs(tmp_path):
    # Epoch 0 "improves" vs inf; epochs 1..4 don't. The counter reaches the
    # patience of 3 at epoch 3 and the halving flag re-arms each epoch after
    # (reference semantics) -> two halvings by the end of epoch 4.
    s = _solver(tmp_path, epochs=5, cv_script=[5.0, 5.0, 5.0, 5.0, 5.0],
                early_stop=False)
    s.train()
    np.testing.assert_allclose(get_lr(s.state), 1e-3 / 4, rtol=1e-6)


def test_improvement_resets_counter(tmp_path):
    s = _solver(tmp_path, epochs=4, cv_script=[5.0, 4.0, 3.0, 2.0])
    s.train()
    np.testing.assert_allclose(get_lr(s.state), 1e-3, rtol=1e-6)  # no halving


def test_early_stop_after_seven(tmp_path):
    s = _solver(tmp_path, epochs=20, cv_script=[1.0] + [2.0] * 19)
    result = s.train()
    # epoch 0 improves; epochs 1..7 don't -> stop at the 7th bad epoch
    assert len(result["cv_loss"]) == 8


def test_best_model_saved_only_on_improvement(tmp_path):
    s = _solver(tmp_path, epochs=3, cv_script=[3.0, 4.0, 2.0])
    s.train()
    best = os.path.join(str(tmp_path / "exp"), "final.ckpt")
    assert os.path.exists(best)
    from convtasnet_tpu.train.checkpoint import load_checkpoint
    _, meta = load_checkpoint(best)
    assert meta["epoch"] == 3  # saved after the epoch-2 (1-based 3) improvement
    assert meta["extra"]["best_val_loss"] == 2.0


def test_preemption_checkpoint(tmp_path):
    s = _solver(tmp_path, epochs=50)
    calls = {"n": 0}
    orig = s.train_step

    def step_and_interrupt(state, batch):
        calls["n"] += 1
        if calls["n"] == 3:
            os.kill(os.getpid(), signal.SIGTERM)
        return orig(state, batch)

    s.train_step = step_and_interrupt
    s.train()
    assert calls["n"] <= 5  # stopped long before 50 epochs x 2 batches
    ckpt = os.path.join(str(tmp_path / "exp"), "preempted.ckpt")
    assert os.path.exists(ckpt)
    # resumable
    cfg2 = TrainConfig(
        model=TINY, data=DataConfig(segment=0.1, batch_size=2),
        solver=SolverConfig(epochs=2, lr=1e-3, print_freq=1000,
                            save_folder=str(tmp_path / "exp2"),
                            continue_from=ckpt))
    s2 = Solver(cfg2, FakeLoader(), FakeLoader(n_batches=1))
    assert int(s2.state.step) == int(s.state.step)


def test_interruption_during_cv_pass_checkpoints(tmp_path):
    """A signal landing during the cv pass must still checkpoint-and-exit
    (previously only the train pass honored it)."""
    s = _solver(tmp_path, epochs=50)
    evals = {"n": 0}
    orig_eval = s.eval_step

    def eval_and_interrupt(state, batch):
        evals["n"] += 1
        os.kill(os.getpid(), signal.SIGTERM)
        return orig_eval(state, batch)

    s.eval_step = eval_and_interrupt
    result = s.train()
    assert evals["n"] == 1  # interrupted on the first cv batch of epoch 0
    assert len(result["cv_loss"]) == 0  # partial cv average never recorded
    assert os.path.exists(os.path.join(str(tmp_path / "exp"),
                                       "preempted.ckpt"))


def test_interruption_inside_steps_per_call_group(tmp_path):
    """With steps_per_call buffering, a signal arriving mid-group drops the
    un-stepped buffered batches and checkpoints immediately (no training
    after the signal)."""
    cfg = TrainConfig(
        model=TINY, data=DataConfig(segment=0.1, batch_size=2),
        solver=SolverConfig(epochs=50, lr=1e-3, print_freq=1000,
                            save_folder=str(tmp_path / "exp"),
                            steps_per_call=4))
    # 3 batches/epoch: with steps_per_call=4 the group never fills, so all
    # batches flow through the tail path
    s = Solver(cfg, FakeLoader(n_batches=3), FakeLoader(n_batches=1))
    stepped = {"n": 0}
    orig = s.train_step

    def counting_step(state, batch):
        stepped["n"] += 1
        return orig(state, batch)

    s.train_step = counting_step
    # interrupt while the group is still buffering (before any step ran)
    batches = s.tr_loader.batches

    class InterruptingLoader:
        def __iter__(self):
            for k, b in enumerate(batches):
                if k == 2:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b

        def __len__(self):
            return 3

        def set_epoch(self, e):
            pass

    s.tr_loader = InterruptingLoader()
    s.train()
    assert stepped["n"] == 0  # buffered batches were dropped, not trained
    assert os.path.exists(os.path.join(str(tmp_path / "exp"),
                                       "preempted.ckpt"))


def test_empty_loaders_fail_fast(tmp_path):
    """An empty cv loader silently scores 0.0 per epoch and early-stops the
    run (the 16 kHz sample-rate-mismatch failure mode); Solver must refuse
    to start instead."""
    import pytest

    cfg = TrainConfig(
        model=TINY, data=DataConfig(segment=0.1, batch_size=2),
        solver=SolverConfig(epochs=1, lr=1e-3, print_freq=1000,
                            save_folder=str(tmp_path / "exp")))

    class Empty(FakeLoader):
        def __init__(self):
            self.batches = []

    with pytest.raises(ValueError, match="cv loader is empty"):
        Solver(cfg, FakeLoader(), Empty())
    with pytest.raises(ValueError, match="training loader is empty"):
        Solver(cfg, Empty(), FakeLoader())


def test_profile_dir_gets_trace(tmp_path):
    """--profile plumbing: training one epoch with profile_dir set writes a
    JAX profiler trace directory (SURVEY §5 tracing subsystem)."""
    prof = tmp_path / "trace"
    s = _solver(tmp_path, epochs=1, cv_script=[1.0],
                profile_dir=str(prof), profile_steps=1)
    s.train()
    # jax.profiler.start_trace/stop_trace writes plugins/profile/<ts>/...
    assert prof.exists()
    found = list(prof.rglob("*.xplane.pb")) + list(prof.rglob("*.trace.json.gz"))
    assert found, list(prof.rglob("*"))


def test_cv_shapes_probed_once_at_startup(tmp_path, monkeypatch):
    """Round-4 VERDICT #5: every distinct cv [rows, T] bucket is probed
    exactly once at solver startup; _run_cv_epoch itself never probes (a
    new padded shape mid-training would otherwise trigger remote compiles
    inside the epoch)."""
    import dataclasses

    from convtasnet_tpu.ops.pallas import tcn_block as tb

    calls = []
    monkeypatch.setattr(
        tb, "ensure_probed",
        lambda cfg, b, T, verbose=True: calls.append(("fwd", b, T)))
    monkeypatch.setattr(
        tb, "ensure_probed_train",
        lambda cfg, b, T, verbose=True: calls.append(("train", b, T)))

    class CvLoader(FakeLoader):
        def batch_shapes(self):
            return [(1, 2400), (2, 1600)]

    cfg = TrainConfig(
        model=dataclasses.replace(TINY, use_pallas=True),
        data=DataConfig(segment=0.1, batch_size=2),
        solver=SolverConfig(epochs=1, lr=1e-3, print_freq=1000,
                            save_folder=str(tmp_path / "exp")))
    s = Solver(cfg, FakeLoader(), CvLoader(n_batches=1))
    fwd_calls = [c for c in calls if c[0] == "fwd"]
    # startup: each distinct cv bucket probed exactly once (plus the
    # train-shape probe, which ensure_probed dedups internally anyway)
    assert fwd_calls.count(("fwd", 1, 2400)) == 1
    assert fwd_calls.count(("fwd", 2, 1600)) == 1

    calls.clear()
    s._run_cv_epoch(0)
    assert calls == []  # no probing inside the cv epoch loop


def test_batch_shapes_match_loaded_batches(tmp_path):
    """dataset.batch_shapes() (manifest-only) must agree with the shapes
    load_batch actually materializes, in both planning modes."""
    import json as _json

    from convtasnet_tpu.data.audio_io import write_wav
    from convtasnet_tpu.data.dataset import SeparationDataset
    from convtasnet_tpu.data.loader import BatchLoader

    sr = 8000
    rng = np.random.default_rng(0)
    infos = {"mix": [], "s1": [], "s2": []}
    for i, n in enumerate([900, 1700, 2600]):
        for k in infos:
            p = str(tmp_path / f"{k}_{i}.wav")
            write_wav(p, rng.standard_normal(n).astype(np.float32) * 0.1, sr)
            infos[k].append([p, n])
    for k, v in infos.items():
        with open(tmp_path / f"{k}.json", "w") as f:
            _json.dump(v, f)

    # full-utterance mode (the cv path): per-batch padded shapes
    ds = SeparationDataset(str(tmp_path), 2, sr, segment=-1.0,
                           num_speakers=2)
    pad = 1000
    want = ds.batch_shapes(pad_to_multiple=pad)
    got = sorted({ds.load_batch(i, pad_to_multiple=pad).mixture.shape
                  for i in range(len(ds))})
    assert [tuple(w) for w in want] == [tuple(g) for g in got]
    lo = BatchLoader(ds, pad_to_multiple=pad)
    assert lo.batch_shapes() == want

    # segment mode (the train path): one static shape
    ds2 = SeparationDataset(str(tmp_path), 4, sr, segment=0.1,
                            num_speakers=2)
    want2 = ds2.batch_shapes()
    got2 = sorted({ds2.load_batch(i).mixture.shape
                   for i in range(len(ds2))})
    assert len(want2) == 1 and [tuple(w) for w in want2] == \
        [tuple(g) for g in got2]


def test_solver_arms_training_probe_budget(tmp_path, monkeypatch):
    """Training arms the generous SolverConfig.probe_budget_s (races
    amortize over hours), not the bench/driver's 6-min default; an explicit
    CONVTASNET_PROBE_BUDGET env var still wins."""
    import dataclasses

    from convtasnet_tpu.ops.pallas import probe_budget
    from convtasnet_tpu.ops.pallas import tcn_block as tb

    monkeypatch.setattr(tb, "ensure_probed", lambda *a, **k: None)
    monkeypatch.setattr(tb, "ensure_probed_train", lambda *a, **k: None)
    armed = []
    monkeypatch.setattr(probe_budget, "begin",
                        lambda s=None: armed.append(s))

    def build():
        cfg = TrainConfig(
            model=dataclasses.replace(TINY, use_pallas=True),
            data=DataConfig(segment=0.1, batch_size=2),
            solver=SolverConfig(epochs=1, lr=1e-3, print_freq=1000,
                                save_folder=str(tmp_path / "exp")))
        Solver(cfg, FakeLoader(), FakeLoader(n_batches=1))

    monkeypatch.delenv("CONVTASNET_PROBE_BUDGET", raising=False)
    build()
    assert armed == [3600.0]

    armed.clear()
    monkeypatch.setenv("CONVTASNET_PROBE_BUDGET", "120")
    build()
    assert armed == [None]  # None = read the env var / module default
