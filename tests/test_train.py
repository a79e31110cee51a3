"""Training runtime tests: jitted step, LR injection, checkpoint save/resume,
and a tiny end-to-end train run (the analog of the reference's
``max_hours=0.1`` smoke config, ``src/run.py:47``) where loss must improve."""

import os

import jax
import numpy as np
import jax
import jax.numpy as jnp

from convtasnet_tpu.config import (
    ConvTasNetConfig,
    DataConfig,
    SolverConfig,
    TrainConfig,
)
from convtasnet_tpu.train.checkpoint import (
    load_checkpoint,
    load_params_for_inference,
    model_config_from_checkpoint,
    restore_state,
    save_checkpoint,
)
from convtasnet_tpu.train.train_step import (
    create_train_state,
    get_lr,
    make_train_step,
    set_lr,
)

TINY = ConvTasNetConfig(
    n_filters=16, kernel_size=8, bottleneck=12, hidden=24, conv_kernel=3,
    num_blocks=2, num_repeats=2, num_speakers=2, sample_rate=8000)
SOLVER = SolverConfig(lr=1e-3, max_grad_norm=5.0, save_folder="")


def _fake_batch(rng, B=4, T=1600):
    mix = rng.standard_normal((B, T)).astype(np.float32)
    src = rng.standard_normal((B, 2, T)).astype(np.float32)
    lengths = np.full((B,), T, np.int32)
    weights = np.ones((B,), np.float32)
    return (jnp.asarray(mix), jnp.asarray(lengths), jnp.asarray(src),
            jnp.asarray(weights))


def test_train_step_reduces_loss_on_fixed_batch():
    state, tx = create_train_state(TINY, SOLVER, jax.random.PRNGKey(0), 1600)
    step = make_train_step(TINY, tx)
    batch = _fake_batch(np.random.default_rng(0))
    losses = []
    for _ in range(15):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 15


def test_grad_clipping_bounds_update():
    state, tx = create_train_state(TINY, SOLVER, jax.random.PRNGKey(0), 1600)
    step = make_train_step(TINY, tx)
    batch = _fake_batch(np.random.default_rng(1))
    _, metrics = step(state, batch)
    assert float(metrics["grad_norm"]) >= 0


def test_zero_weight_rows_do_not_affect_grads():
    state, tx = create_train_state(TINY, SOLVER, jax.random.PRNGKey(0), 1600)
    step = make_train_step(TINY, tx, donate=False)
    rng = np.random.default_rng(2)
    mix, lengths, src, w = _fake_batch(rng)
    # batch 2: same real rows, garbage in padded rows with weight 0
    mix2 = np.asarray(mix).copy(); mix2[2:] = 1000.0
    src2 = np.asarray(src).copy(); src2[2:] = -1000.0
    w_real = np.array([1, 1, 0, 0], np.float32)
    s1, m1 = step(state, (mix, lengths, src, jnp.asarray(w_real)))
    s2, m2 = step(state, (jnp.asarray(mix2), lengths, jnp.asarray(src2),
                          jnp.asarray(w_real)))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_lr_get_set_without_recompile():
    state, tx = create_train_state(TINY, SOLVER, jax.random.PRNGKey(0), 1600)
    step = make_train_step(TINY, tx)
    batch = _fake_batch(np.random.default_rng(3))
    assert abs(get_lr(state) - 1e-3) < 1e-9
    state, _ = step(state, batch)
    state = set_lr(state, 5e-4)
    assert abs(get_lr(state) - 5e-4) < 1e-9
    state, _ = step(state, batch)  # same compiled fn, new lr
    assert int(state.step) == 2


def test_checkpoint_roundtrip(tmp_path):
    state, tx = create_train_state(TINY, SOLVER, jax.random.PRNGKey(0), 1600)
    step = make_train_step(TINY, tx, donate=False)
    batch = _fake_batch(np.random.default_rng(4))
    state, _ = step(state, batch)
    path = str(tmp_path / "ckpt" / "model.ckpt")
    save_checkpoint(path, state, TINY, epoch=3, tr_loss=[1.0, 0.5],
                    cv_loss=[1.1, 0.6], extra={"lr": get_lr(state)})
    # architecture reconstructable from metadata alone (self-describing)
    cfg = model_config_from_checkpoint(path)
    assert cfg == TINY
    state_dict, meta = load_checkpoint(path)
    assert meta["epoch"] == 3
    assert meta["tr_loss"] == [1.0, 0.5]
    fresh, _ = create_train_state(TINY, SOLVER, jax.random.PRNGKey(9), 1600)
    restored = restore_state(fresh, state_dict)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    # inference loading path
    cfg2, variables = load_params_for_inference(path)
    assert cfg2 == TINY and "params" in variables


def test_end_to_end_tiny_training(tmp_path):
    """Synthetic two-sine corpus -> manifests -> loader -> Solver.train():
    loss must drop and a best-model checkpoint must appear."""
    from tests.test_data import _write_corpus
    from convtasnet_tpu.data.manifest import build_manifests
    from convtasnet_tpu.data.dataset import SeparationDataset
    from convtasnet_tpu.data.loader import BatchLoader
    from convtasnet_tpu.train.solver import Solver

    root = _write_corpus(str(tmp_path), [16000] * 6, split="tr", seed=0)
    _write_corpus(str(tmp_path), [16000] * 2, split="cv", seed=1)
    jd = os.path.join(root, "json")
    build_manifests(root, jd, 8000, splits=("tr", "cv"))

    cfg = TrainConfig(
        model=TINY,
        data=DataConfig(sample_rate=8000, segment=1.0, batch_size=3),
        solver=SolverConfig(
            epochs=3, lr=1e-3, save_folder=str(tmp_path / "exp"),
            print_freq=2, enable_checkpoint=True),
    )
    tr_ds = SeparationDataset(os.path.join(jd, "tr"), 3, 8000, segment=1.0)
    cv_ds = SeparationDataset(os.path.join(jd, "cv"), 1, 8000, segment=-1.0,
                              cv_maxlen=6.0)
    tr_loader = BatchLoader(tr_ds, shuffle=True, seed=0)
    cv_loader = BatchLoader(cv_ds, pad_to_multiple=1600)
    solver = Solver(cfg, tr_loader, cv_loader)
    result = solver.train()
    assert len(result["tr_loss"]) == 3
    assert result["tr_loss"][-1] < result["tr_loss"][0]
    assert os.path.exists(os.path.join(str(tmp_path / "exp"), "final.ckpt"))
    assert os.path.exists(
        os.path.join(str(tmp_path / "exp"), "checkpoint_models", "epoch1.ckpt"))
    # resume: starts from saved epoch, runs to the configured total
    cfg2 = TrainConfig(model=cfg.model, data=cfg.data, solver=SolverConfig(
        epochs=4, lr=1e-3, save_folder=str(tmp_path / "exp2"), print_freq=2,
        continue_from=os.path.join(str(tmp_path / "exp"), "final.ckpt")))
    solver2 = Solver(cfg2, tr_loader, cv_loader)
    assert solver2.start_epoch > 0
    result2 = solver2.train()
    assert len(result2["tr_loss"]) <= 4


def test_async_checkpoint(tmp_path):
    from convtasnet_tpu.train.checkpoint import wait_for_saves

    state, tx = create_train_state(TINY, SOLVER, jax.random.PRNGKey(0), 1600)
    path = str(tmp_path / "async.ckpt")
    save_checkpoint(path, state, TINY, epoch=1, async_save=True)
    wait_for_saves()
    cfg = model_config_from_checkpoint(path)
    assert cfg == TINY


def test_multi_step_matches_sequential():
    from convtasnet_tpu.train.train_step import make_multi_train_step

    state1, tx1 = create_train_state(TINY, SOLVER, jax.random.PRNGKey(0), 1600)
    state2, tx2 = create_train_state(TINY, SOLVER, jax.random.PRNGKey(0), 1600)
    step = make_train_step(TINY, tx1, donate=False)
    multi = make_multi_train_step(TINY, tx2, donate=False)
    rng = np.random.default_rng(0)
    batches = [_fake_batch(rng) for _ in range(4)]
    for b in batches:
        state1, m1 = step(state1, b)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    state2, m2 = multi(state2, stacked)
    assert m2["loss"].shape == (4,)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"][-1]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    assert int(state2.step) == 4


def test_solver_steps_per_call(tmp_path):
    """Solver with multi-step dispatch trains identically shaped results."""
    from tests.test_solver import FakeLoader
    from convtasnet_tpu.config import DataConfig, TrainConfig
    from convtasnet_tpu.train.solver import Solver

    def run(spc):
        cfg = TrainConfig(
            model=TINY, data=DataConfig(segment=0.1, batch_size=2),
            solver=SolverConfig(epochs=2, lr=1e-3, print_freq=1000,
                                save_folder=str(tmp_path / f"exp{spc}"),
                                steps_per_call=spc))
        s = Solver(cfg, FakeLoader(n_batches=5), FakeLoader(n_batches=1))
        result = s.train()
        return result, s.state

    r1, s1 = run(1)
    r2, s2 = run(2)  # 5 batches = 2 full groups + 1 tail single-step
    np.testing.assert_allclose(r1["tr_loss"], r2["tr_loss"], rtol=1e-4)
    assert int(s1.step) == int(s2.step) == 10
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_orbax_checkpoint_backend_roundtrip(tmp_path):
    """backend='orbax' writes a directory store; loads auto-detect and
    return state/meta identical to the msgpack package."""
    import jax

    from convtasnet_tpu.config import ConvTasNetConfig, SolverConfig
    from convtasnet_tpu.train.checkpoint import (
        load_checkpoint,
        load_params_for_inference,
        save_checkpoint,
    )
    from convtasnet_tpu.train.train_step import create_train_state

    cfg = ConvTasNetConfig(
        n_filters=16, kernel_size=8, bottleneck=12, hidden=24,
        conv_kernel=3, num_blocks=2, num_repeats=1, num_speakers=2)
    state, _ = create_train_state(cfg, SolverConfig(lr=1e-3),
                                  jax.random.PRNGKey(3), 2000)
    mp = str(tmp_path / "pkg.ckpt")
    od = str(tmp_path / "orbax_ckpt")
    save_checkpoint(mp, state, cfg, epoch=5, tr_loss=[1.0], cv_loss=[2.0])
    save_checkpoint(od, state, cfg, epoch=5, tr_loss=[1.0], cv_loss=[2.0],
                    backend="orbax")
    sd_m, meta_m = load_checkpoint(mp)
    sd_o, meta_o = load_checkpoint(od)
    assert meta_o == meta_m
    lm = jax.tree_util.tree_leaves(sd_m)
    lo = jax.tree_util.tree_leaves(sd_o)
    assert len(lm) == len(lo)
    for a, b in zip(lm, lo):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # inference loader accepts the directory form
    cfg2, variables = load_params_for_inference(od)
    assert cfg2 == cfg
    assert "params" in variables


def test_orbax_save_preempted_mid_swap_keeps_previous(tmp_path):
    """The orbax backend must never leave zero restorable checkpoints: a
    preemption between the state-dir swap renames (the window force=True
    used to widen to the whole write) falls back to ``state.old``."""
    import os

    import jax

    from convtasnet_tpu.config import ConvTasNetConfig, SolverConfig
    from convtasnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from convtasnet_tpu.train.train_step import create_train_state

    cfg = ConvTasNetConfig(
        n_filters=16, kernel_size=8, bottleneck=12, hidden=24,
        conv_kernel=3, num_blocks=2, num_repeats=1, num_speakers=2)
    state, _ = create_train_state(cfg, SolverConfig(lr=1e-3),
                                  jax.random.PRNGKey(3), 2000)
    od = str(tmp_path / "orbax_ckpt")
    save_checkpoint(od, state, cfg, epoch=1, backend="orbax")
    # overwrite must keep a valid store throughout
    save_checkpoint(od, state, cfg, epoch=2, backend="orbax")
    _, meta = load_checkpoint(od)
    assert meta["epoch"] == 2
    # simulate dying after `state -> state.old` but before `state.new -> state`
    sdir = os.path.join(od, "state")
    os.rename(sdir, sdir + ".old")
    sd, meta = load_checkpoint(od)
    assert meta["epoch"] == 2
    assert jax.tree_util.tree_leaves(sd)


def test_batch_chunked_step_matches_unchunked():
    """batch_chunk accumulates grads over row slices inside the step; the
    resulting loss, grad_norm, and updated params must match the full-batch
    step (the weighted-sum loss is additive over rows)."""
    batch = _fake_batch(np.random.default_rng(3), B=4, T=1600)
    # mark one row as padding so the weight normalizer is exercised
    w = np.ones((4,), np.float32)
    w[-1] = 0.0
    batch = (batch[0], batch[1], batch[2], jnp.asarray(w))

    state1, tx1 = create_train_state(TINY, SOLVER, jax.random.PRNGKey(0), 1600)
    step1 = make_train_step(TINY, tx1, donate=False)
    s1, m1 = step1(state1, batch)

    state2, tx2 = create_train_state(TINY, SOLVER, jax.random.PRNGKey(0), 1600)
    step2 = make_train_step(TINY, tx2, donate=False, batch_chunk=2)
    s2, m2 = step2(state2, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_batch_chunked_step_bn_falls_back():
    """BN running stats are a full-batch reduction; chunking must silently
    use the unchunked path (identical batch_stats update)."""
    cfg = ConvTasNetConfig(
        n_filters=16, kernel_size=8, bottleneck=12, hidden=24, conv_kernel=3,
        num_blocks=2, num_repeats=1, num_speakers=2, norm_type="BN")
    batch = _fake_batch(np.random.default_rng(4), B=4, T=1600)
    state1, tx1 = create_train_state(cfg, SOLVER, jax.random.PRNGKey(0), 1600)
    step1 = make_train_step(cfg, tx1, donate=False)
    s1, _ = step1(state1, batch)
    state2, tx2 = create_train_state(cfg, SOLVER, jax.random.PRNGKey(0), 1600)
    step2 = make_train_step(cfg, tx2, donate=False, batch_chunk=2)
    s2, _ = step2(state2, batch)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_solver_train_batch_chunk(tmp_path):
    """Solver with train_batch_chunk: end-to-end training works and the
    loss drops (grad accumulation over 2-row slices inside the step)."""
    from tests.test_data import _write_corpus
    from convtasnet_tpu.data.manifest import build_manifests
    from convtasnet_tpu.data.dataset import SeparationDataset
    from convtasnet_tpu.data.loader import BatchLoader
    from convtasnet_tpu.train.solver import Solver

    root = _write_corpus(str(tmp_path), [16000] * 6, split="tr", seed=0)
    _write_corpus(str(tmp_path), [16000] * 2, split="cv", seed=1)
    jd = os.path.join(root, "json")
    build_manifests(root, jd, 8000, splits=("tr", "cv"))
    cfg = TrainConfig(
        model=TINY,
        data=DataConfig(sample_rate=8000, segment=1.0, batch_size=4),
        solver=SolverConfig(
            epochs=2, lr=1e-3, save_folder=str(tmp_path / "exp"),
            print_freq=2, train_batch_chunk=2),
    )
    tr = BatchLoader(SeparationDataset(os.path.join(jd, "tr"), 4, 8000,
                                       segment=1.0), shuffle=True, seed=0)
    cv = BatchLoader(SeparationDataset(os.path.join(jd, "cv"), 1, 8000,
                                       segment=-1.0, cv_maxlen=6.0),
                     pad_to_multiple=1600)
    result = Solver(cfg, tr, cv).train()
    assert len(result["tr_loss"]) == 2
    assert result["tr_loss"][-1] < result["tr_loss"][0]
