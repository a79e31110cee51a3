"""Dual-path attention separator (models/dual_path.py) — the second
separator family behind the shared encoder/decoder/PIT/training stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params
from convtasnet_tpu.models.dual_path import masked_mha, sinusoid_encoding


def _cfg(**kw):
    base = dict(
        n_filters=16, kernel_size=8, bottleneck=16, hidden=24,
        num_blocks=2, num_repeats=1, num_speakers=2,
        separator="dpt", dpt_chunk=16, dpt_layers=2, dpt_heads=4, dpt_ff=32)
    base.update(kw)
    return ConvTasNetConfig(**base)


def test_forward_shape_and_jit():
    cfg = _cfg()
    model = ConvTasNet(cfg)
    mix = jnp.asarray(np.random.default_rng(0).standard_normal((3, 2000)),
                      jnp.float32)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=2000)
    est = jax.jit(lambda m: model.apply(variables, m))(mix)
    assert est.shape == (3, 2, 2000)
    assert jnp.all(jnp.isfinite(est))


def test_padded_tail_masked_out_of_attention():
    """Valid-frame outputs must not depend on what lands in the chunk
    padding: keys beyond the valid length carry zero softmax weight."""
    rng = np.random.default_rng(1)
    D, T, Tv, H = 16, 12, 7, 4
    q = jnp.asarray(rng.standard_normal((1, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, T, D)), jnp.float32)
    valid = jnp.arange(T) < Tv
    out1 = masked_mha(q, k, v, valid[None], H)
    # perturb keys/values ONLY at invalid positions
    noise = jnp.asarray(rng.standard_normal((1, T, D)), jnp.float32)
    pad = (~valid)[None, :, None]
    out2 = masked_mha(q, jnp.where(pad, k + 7 * noise, k),
                      jnp.where(pad, v - 3 * noise, v), valid[None], H)
    np.testing.assert_allclose(np.asarray(out1[:, :Tv]),
                               np.asarray(out2[:, :Tv]), atol=1e-6)


@pytest.mark.slow
def test_model_pad_independence_end_to_end():
    """K not a multiple of dpt_chunk: outputs finite and deterministic."""
    cfg = _cfg(dpt_chunk=32)
    model = ConvTasNet(cfg)
    T = 1000  # K = (1000-8)//4+1 = 249 -> pads to 256
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    mix = jnp.asarray(np.random.default_rng(2).standard_normal((2, T)),
                      jnp.float32)
    e1 = model.apply(variables, mix)
    e2 = model.apply(variables, mix)
    assert jnp.all(jnp.isfinite(e1))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_sinusoid_encoding_shape_range():
    enc = sinusoid_encoding(10, 8)
    assert enc.shape == (10, 8)
    assert np.all(np.abs(enc) <= 1.0 + 1e-6)


@pytest.mark.slow
def test_gradients_flow_everywhere():
    cfg = _cfg()
    model = ConvTasNet(cfg)
    T = 600
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    mix = jnp.asarray(np.random.default_rng(3).standard_normal((2, T)),
                      jnp.float32)

    def loss(params):
        est = model.apply({"params": params}, mix, train=True)
        return jnp.mean(jnp.square(est))

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves
    for g in leaves:
        assert jnp.all(jnp.isfinite(g))
    # every separator parameter receives signal
    sep_leaves = jax.tree_util.tree_leaves(grads["separator"])
    assert all(float(jnp.max(jnp.abs(g))) > 0 for g in sep_leaves)


@pytest.mark.slow
def test_train_step_and_overfit_micro():
    """A real PIT train step drives the loss down on a fixed tiny batch —
    catches mask/positional/attention wiring bugs end to end."""
    from convtasnet_tpu.config import SolverConfig
    from convtasnet_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    cfg = _cfg(dpt_chunk=32, dpt_layers=1)
    T = 800
    state, tx = create_train_state(cfg, SolverConfig(lr=3e-3),
                                   jax.random.PRNGKey(0), T)
    step = jax.jit(make_train_step(cfg, tx))
    rng = np.random.default_rng(4)
    src = jnp.asarray(rng.standard_normal((2, 2, T)), jnp.float32)
    mix = jnp.sum(src, axis=1)
    batch = (mix, jnp.full((2,), T, jnp.int32), src,
             jnp.ones((2,), jnp.float32))
    state, m0 = step(state, batch)
    for _ in range(30):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])


def test_checkpoint_roundtrip_dpt(tmp_path):
    """separator='dpt' round-trips through the self-describing checkpoint:
    the config (incl. dpt knobs) reconstructs and outputs match exactly."""
    from convtasnet_tpu.config import SolverConfig
    from convtasnet_tpu.train.checkpoint import (
        load_params_for_inference,
        save_checkpoint,
    )
    from convtasnet_tpu.train.train_step import create_train_state

    cfg = _cfg(dpt_layers=1, dpt_chunk=16)
    T = 500
    state, _ = create_train_state(cfg, SolverConfig(lr=1e-3),
                                  jax.random.PRNGKey(1), T)
    p = str(tmp_path / "dpt.ckpt")
    save_checkpoint(p, state, cfg, epoch=1)
    cfg2, variables = load_params_for_inference(p)
    assert cfg2 == cfg
    model = ConvTasNet(cfg2)
    mix = jnp.asarray(np.random.default_rng(5).standard_normal((1, T)),
                      jnp.float32)
    e1 = ConvTasNet(cfg).apply({"params": state.params}, mix)
    e2 = model.apply(variables, mix)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_streaming_rejects_dpt():
    # (tp_forward used to reject dpt too; it now routes to the dual-path
    # shard_map TP — parity covered by tests/test_dpt_tp.py)
    from convtasnet_tpu.models.streaming import init_stream_state

    with pytest.raises(ValueError, match="TCN separator only"):
        init_stream_state(_cfg(causal=True, norm_type="cLN"), 1)


def test_tensor_parallel_train_step_dpt():
    """GSPMD-sharded train step for the dual-path family: attention QKV /
    FFN matmuls Megatron-split over the model axis; loss matches the
    unsharded step."""
    from convtasnet_tpu.config import SolverConfig
    from convtasnet_tpu.parallel.mesh import make_mesh
    from convtasnet_tpu.parallel.tensor_parallel import param_partition_specs
    from convtasnet_tpu.train.train_step import (
        create_train_state,
        make_sharded_train_step,
        make_train_step,
    )

    cfg = _cfg(bottleneck=16, dpt_heads=4, dpt_ff=32, dpt_layers=2)
    T = 500
    state, tx = create_train_state(cfg, SolverConfig(lr=1e-3),
                                   jax.random.PRNGKey(0), T)
    # specs cover the full param tree
    specs = param_partition_specs(
        cfg, {"params": state.params, "batch_stats": state.batch_stats})
    # zips exactly (raises on any structural mismatch)
    jax.tree_util.tree_map(lambda s, p: p.shape, specs["params"],
                           state.params)

    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.standard_normal((4, 2, T)), jnp.float32)
    mix = jnp.sum(src, axis=1)
    batch = (mix, jnp.full((4,), T, jnp.int32), src,
             jnp.ones((4,), jnp.float32))

    ref_step = jax.jit(make_train_step(cfg, tx))
    _, m_ref = ref_step(state, batch)

    mesh = make_mesh(n_data=4, n_model=2)
    state2, tx2 = create_train_state(cfg, SolverConfig(lr=1e-3),
                                     jax.random.PRNGKey(0), T)
    step2, shard_state = make_sharded_train_step(cfg, tx2, state2, mesh)
    s2 = shard_state(state2)
    s2, m_tp = step2(s2, batch)
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_tp["loss"]),
                               rtol=2e-5)


@pytest.mark.slow
def test_data_parallel_train_step_dpt():
    """The GSPMD data-parallel train step works unchanged for the new
    family (batch-axis sharding only)."""
    from convtasnet_tpu.config import SolverConfig
    from convtasnet_tpu.parallel.mesh import make_mesh, shard_batch
    from convtasnet_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    cfg = _cfg(dpt_layers=1)
    T = 400
    mesh = make_mesh()  # all 8 virtual devices on the data axis
    state, tx = create_train_state(cfg, SolverConfig(lr=1e-3),
                                   jax.random.PRNGKey(0), T)
    step = jax.jit(make_train_step(cfg, tx))
    rng = np.random.default_rng(6)
    src = jnp.asarray(rng.standard_normal((8, 2, T)), jnp.float32)
    mix = jnp.sum(src, axis=1)
    batch = (mix, jnp.full((8,), T, jnp.int32), src,
             jnp.ones((8,), jnp.float32))
    _, m_ref = step(state, batch)
    with mesh:
        sharded = tuple(shard_batch(mesh, b) for b in batch)
        _, m_dp = step(state, sharded)
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_dp["loss"]),
                               rtol=2e-5)


def test_auto_heads_resolves_to_head_dim_32():
    """dpt_heads=0 (the default) resolves to head-dim 32 — the measured
    quality sweet spot at both gate scales (docs/RESULTS.md: B=128 favors
    4 heads, B=256 favors 8). Explicit values pass through unchanged, so
    checkpoints that stored a head count keep serving identically."""
    assert ConvTasNetConfig(bottleneck=256, dpt_heads=0).dpt_num_heads == 8
    assert ConvTasNetConfig(bottleneck=128, dpt_heads=0).dpt_num_heads == 4
    assert ConvTasNetConfig(bottleneck=16, dpt_heads=0).dpt_num_heads == 1
    assert ConvTasNetConfig(bottleneck=256, dpt_heads=4).dpt_num_heads == 4
    # default config is auto
    assert ConvTasNetConfig().dpt_heads == 0


def test_auto_heads_forward_runs():
    cfg = _cfg(bottleneck=32, dpt_heads=0)  # auto -> 1 head at tiny width
    assert cfg.dpt_num_heads == 1
    model = ConvTasNet(cfg)
    mix = jnp.asarray(np.random.default_rng(2).standard_normal((2, 1200)),
                      jnp.float32)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=1200)
    est = model.apply(variables, mix)
    assert est.shape == (2, 2, 1200)
    assert jnp.all(jnp.isfinite(est))
