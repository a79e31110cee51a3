"""Data-parallel tests on the virtual 8-device CPU mesh: sharded train step
equals single-device math, mesh helpers, and the driver dry-run contract."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from convtasnet_tpu.config import ConvTasNetConfig, SolverConfig
from convtasnet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_batch_to_shards,
    replicated_sharding,
    shard_batch,
)
from convtasnet_tpu.train.train_step import create_train_state, make_train_step

TINY = ConvTasNetConfig(
    n_filters=16, kernel_size=8, bottleneck=12, hidden=24, conv_kernel=3,
    num_blocks=2, num_repeats=1, num_speakers=2)


def _batch(rng, B, T=1600):
    return (
        rng.standard_normal((B, T)).astype(np.float32),
        np.full((B,), T, np.int32),
        rng.standard_normal((B, 2, T)).astype(np.float32),
        np.ones((B,), np.float32),
    )


def test_mesh_helpers():
    mesh = make_mesh(n_data=8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    assert pad_batch_to_shards(3, 8) == 8
    assert pad_batch_to_shards(8, 8) == 8


def test_sharded_step_matches_single_device():
    solver_cfg = SolverConfig(lr=1e-3)
    rng = np.random.default_rng(0)
    batch_np = _batch(rng, 8)

    # single device
    state1, tx1 = create_train_state(TINY, solver_cfg, jax.random.PRNGKey(0), 1600)
    step1 = make_train_step(TINY, tx1, donate=False)
    s1, m1 = step1(state1, jax.tree_util.tree_map(jnp.asarray, batch_np))

    # 8-device data parallel
    mesh = make_mesh(n_data=8)
    state8, tx8 = create_train_state(TINY, solver_cfg, jax.random.PRNGKey(0), 1600)
    state8 = jax.device_put(state8, replicated_sharding(mesh))
    step8 = make_train_step(TINY, tx8, mesh=mesh, donate=False)
    batch8 = shard_batch(mesh, batch_np)
    s8, m8 = step8(state8, batch8)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sharded_step_with_fused_kernels_matches_xla():
    """GSPMD-sharded train step with the fused Pallas train path (interpret
    mode under the CPU mesh) == the plain XLA sharded step: the pallas_call
    partitions over the batch grid without de-sharding the program."""
    import dataclasses

    solver_cfg = SolverConfig(lr=1e-3)
    rng = np.random.default_rng(0)
    batch_np = _batch(rng, 8)
    mesh = make_mesh(n_data=8)

    losses = {}
    for use_pallas in (False, True):
        cfg = dataclasses.replace(TINY, use_pallas=use_pallas)
        state, tx = create_train_state(cfg, solver_cfg, jax.random.PRNGKey(0), 1600)
        state = jax.device_put(state, replicated_sharding(mesh))
        step = make_train_step(cfg, tx, mesh=mesh, donate=False)
        s, m = step(state, shard_batch(mesh, batch_np))
        losses[use_pallas] = (float(m["loss"]),
                              jax.tree_util.tree_leaves(s.params))
    np.testing.assert_allclose(losses[True][0], losses[False][0], rtol=1e-5)
    for a, b in zip(losses[True][1], losses[False][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_sharded_dpt_step_with_fused_pair_matches_xla():
    """DP-sharded DPT train step with the fused inter-attention custom-VJP
    pair (interpret mode under the CPU mesh) == the same step through plain
    XLA autodiff: the pallas_call grids (batch-leading) partition over
    ``data`` without de-sharding, forward AND backward."""
    import dataclasses

    solver_cfg = SolverConfig(lr=1e-3)
    rng = np.random.default_rng(1)
    batch_np = _batch(rng, 8)
    mesh = make_mesh(n_data=8)

    losses = {}
    for use_pallas in (False, True):
        # bottleneck 128 satisfies the fused gate's lane-width requirement
        cfg = dataclasses.replace(
            TINY, separator="dpt", bottleneck=128, dpt_chunk=16,
            dpt_layers=1, dpt_heads=4, dpt_ff=32, use_pallas=use_pallas)
        state, tx = create_train_state(cfg, solver_cfg,
                                       jax.random.PRNGKey(0), 1600)
        state = jax.device_put(state, replicated_sharding(mesh))
        step = make_train_step(cfg, tx, mesh=mesh, donate=False)
        s, m = step(state, shard_batch(mesh, batch_np))
        losses[use_pallas] = (float(m["loss"]),
                              jax.tree_util.tree_leaves(s.params))
    np.testing.assert_allclose(losses[True][0], losses[False][0], rtol=1e-5)
    for a, b in zip(losses[True][1], losses[False][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_batch_actually_sharded():
    mesh = make_mesh(n_data=8)
    x = np.zeros((8, 100), np.float32)
    y = jax.device_put(x, batch_sharding(mesh))
    assert len(y.addressable_shards) == 8
    assert y.addressable_shards[0].data.shape == (1, 100)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_graft_entry_compiles():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry2", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 2, 32000)
