"""Tensor-parallel dual-path forward (parallel/dpt_tp): head-group split
with per-shard fused kernels, vs the unsharded model on the virtual mesh.

Covers the weight resharding (head-aligned q/k/v splits), the partial
(projection-only) kernel contract, and full-forward parity under both the
fused interpret path and the XLA fallback.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params
from convtasnet_tpu.parallel.mesh import make_mesh
from convtasnet_tpu.parallel.dpt_tp import (
    _stack_qkv,
    _stack_rows,
    dpt_tp_forward,
    dpt_tp_variables,
)

DPT = dict(separator="dpt", n_filters=16, kernel_size=8, bottleneck=64,
           dpt_chunk=16, dpt_layers=2, dpt_ff=128, dpt_heads=4,
           num_speakers=2)


def test_stack_qkv_head_aligned():
    """Shard i's local qkv must hold q|k|v columns of head group i —
    not a contiguous slice of the concatenated [B, 3B] matrix."""
    B, m = 8, 2
    w = jnp.arange(B * 3 * B, dtype=jnp.float32).reshape(B, 3 * B)
    stacked = _stack_qkv(w, m)
    assert stacked.shape == (m, B, 3 * B // m)
    q, k, v = jnp.split(w, 3, axis=1)
    Bl = B // m
    for i in range(m):
        want = jnp.concatenate(
            [q[:, i * Bl:(i + 1) * Bl], k[:, i * Bl:(i + 1) * Bl],
             v[:, i * Bl:(i + 1) * Bl]], axis=1)
        np.testing.assert_array_equal(np.asarray(stacked[i]),
                                      np.asarray(want))


def test_partial_attention_combines_to_full():
    """Sum of per-head-group partial projections + residual == the full
    sublayer, for both fused (interpret) and XLA partial paths."""
    from convtasnet_tpu.ops.pallas.dpt_intra import (
        fused_intra_attention,
        xla_intra_attention,
    )

    rng = np.random.default_rng(0)
    M, n, S, B, h, m = 2, 3, 16, 64, 4, 2
    x = jnp.asarray(rng.standard_normal((M, n, S, B)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(B), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(B), jnp.float32)
    w_qkv = jnp.asarray(rng.standard_normal((B, 3 * B)) / 8, jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((B, B)) / 8, jnp.float32)
    bias = jnp.where(jnp.arange(n * S).reshape(n, S) < n * S - 5,
                     0.0, -1e9).astype(jnp.float32)

    full = xla_intra_attention(x, gamma, beta, w_qkv, w_out, bias,
                               n_heads=h)
    qkv_sh = _stack_qkv(w_qkv, m)
    out_sh = _stack_rows(w_out, m)
    acc = jnp.zeros_like(x)
    for i in range(m):
        acc = acc + xla_intra_attention(
            x, gamma, beta, qkv_sh[i], out_sh[i], bias,
            n_heads=h // m, partial=True)
    np.testing.assert_allclose(np.asarray(x + acc), np.asarray(full),
                               rtol=1e-4, atol=1e-4)

    # fused partial (interpret) matches the XLA partial shard-for-shard
    for i in range(m):
        got = fused_intra_attention(
            x, gamma, beta, qkv_sh[i], out_sh[i], bias,
            n_heads=h // m, interpret=True, partial=True)
        want = xla_intra_attention(
            x, gamma, beta, qkv_sh[i], out_sh[i], bias,
            n_heads=h // m, partial=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_partial_inter_and_ffn_combine_to_full():
    from convtasnet_tpu.ops.pallas.dpt_attention import xla_inter_attention
    from convtasnet_tpu.ops.pallas.dpt_ffn import xla_ffn
    from convtasnet_tpu.parallel.dpt_tp import _stack_cols

    rng = np.random.default_rng(1)
    M, n, S, B, h, m, F = 2, 3, 16, 64, 4, 4, 128
    x = jnp.asarray(rng.standard_normal((M, n, S, B)), jnp.float32)
    gamma = jnp.ones((B,), jnp.float32)
    beta = jnp.zeros((B,), jnp.float32)
    w_qkv = jnp.asarray(rng.standard_normal((B, 3 * B)) / 8, jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((B, B)) / 8, jnp.float32)
    bias = jnp.zeros((n, S), jnp.float32)
    full = xla_inter_attention(x, gamma, beta, w_qkv, w_out, bias,
                               n_heads=h)
    qkv_sh = _stack_qkv(w_qkv, m)
    out_sh = _stack_rows(w_out, m)
    acc = jnp.zeros_like(x)
    for i in range(m):
        acc = acc + xla_inter_attention(
            x, gamma, beta, qkv_sh[i], out_sh[i], bias,
            n_heads=h // m, partial=True)
    np.testing.assert_allclose(np.asarray(x + acc), np.asarray(full),
                               rtol=1e-4, atol=1e-4)

    x3 = x.reshape(M, n * S, B)
    w_up = jnp.asarray(rng.standard_normal((B, F)) / 8, jnp.float32)
    b_up = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)
    w_dn = jnp.asarray(rng.standard_normal((F, B)) / 11, jnp.float32)
    b_dn = jnp.asarray(rng.standard_normal(B) * 0.1, jnp.float32)
    full = xla_ffn(x3, gamma, beta, w_up, b_up, w_dn, b_dn)
    up_sh, bup_sh = _stack_cols(w_up, m), jnp.stack(jnp.split(b_up, m))
    dn_sh = _stack_rows(w_dn, m)
    acc = jnp.zeros_like(x3)
    for i in range(m):
        acc = acc + xla_ffn(x3, gamma, beta, up_sh[i], bup_sh[i],
                            dn_sh[i], b_dn, partial=True)
    np.testing.assert_allclose(np.asarray(x3 + acc + b_dn),
                               np.asarray(full), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n_data,n_model,T", [(2, 4, 1200),
                                               (4, 2, 800)])
@pytest.mark.slow
def test_dpt_tp_matches_unsharded(n_data, n_model, T):
    cfg = ConvTasNetConfig(**DPT)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    mix = jax.random.normal(jax.random.PRNGKey(1), (4, T))
    want = np.asarray(ConvTasNet(cfg).apply(variables, mix, train=False))

    mesh = make_mesh(n_data=n_data, n_model=n_model)
    got = np.asarray(dpt_tp_forward(cfg, variables, mix, mesh))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_dpt_tp_xla_fallback_matches():
    cfg = ConvTasNetConfig(**DPT, use_pallas=False)
    T = 800
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    mix = jax.random.normal(jax.random.PRNGKey(2), (2, T))
    want = np.asarray(ConvTasNet(cfg).apply(variables, mix, train=False))
    mesh = make_mesh(n_data=2, n_model=4)
    got = np.asarray(dpt_tp_forward(cfg, variables, mix, mesh))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_dpt_tp_degenerate_model_axis():
    """model=1: full-width 'shards', psum over a singleton axis."""
    cfg = ConvTasNetConfig(**DPT)
    T = 800
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    mix = jax.random.normal(jax.random.PRNGKey(3), (8, T))
    want = np.asarray(ConvTasNet(cfg).apply(variables, mix, train=False))
    mesh = make_mesh(n_data=8, n_model=1)
    got = np.asarray(dpt_tp_forward(cfg, variables, mix, mesh))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dpt_tp_rejects_misaligned_split():
    cfg = ConvTasNetConfig(**DPT)  # 4 heads
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=800)
    with pytest.raises(ValueError, match="head-aligned"):
        dpt_tp_variables(cfg, variables, 8)


def test_separate_tensor_parallel_cli(tmp_path):
    """Model-parallel serving through the public separate() API (dpt
    routes to the fused-kernel shard_map; output matches the plain
    batched path). Batch 3 on a data axis of 4 exercises the row
    padding."""
    import os
    from convtasnet_tpu.data.audio_io import read_wav, write_wav
    from convtasnet_tpu.infer.separate import separate
    from convtasnet_tpu.train.checkpoint import save_checkpoint

    cfg = ConvTasNetConfig(**DPT)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, {"params": variables["params"], "batch_stats": {}},
                    cfg, epoch=0)
    mix_dir = tmp_path / "mix"
    os.makedirs(mix_dir)
    rng = np.random.default_rng(2)
    for i in range(3):
        write_wav(str(mix_dir / f"u{i}.wav"),
                  0.3 * rng.standard_normal(12000).astype(np.float32), 8000)
    out_tp = str(tmp_path / "out_tp")
    n = separate(ckpt, out_tp, mix_dir=str(mix_dir), batch_size=3,
                 tensor_parallel=2)
    assert n == 3
    out_ref = str(tmp_path / "out_ref")
    assert separate(ckpt, out_ref, mix_dir=str(mix_dir), batch_size=3,
                    use_pallas=False) == 3
    for i in range(3):
        for c in (1, 2):
            got, _ = read_wav(os.path.join(out_tp, f"u{i}_s{c}.wav"))
            want, _ = read_wav(os.path.join(out_ref, f"u{i}_s{c}.wav"))
            np.testing.assert_allclose(got, want, atol=1e-3)


def test_separate_tensor_parallel_tcn(tmp_path):
    """--tensor-parallel also serves the TCN family (hidden-dim split)."""
    import os
    from convtasnet_tpu.data.audio_io import write_wav
    from convtasnet_tpu.infer.separate import separate
    from convtasnet_tpu.train.checkpoint import save_checkpoint

    cfg = ConvTasNetConfig(n_filters=16, kernel_size=8, bottleneck=12,
                           hidden=32, conv_kernel=3, num_blocks=2,
                           num_repeats=2, num_speakers=2)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, {"params": variables["params"], "batch_stats": {}},
                    cfg, epoch=0)
    mix_dir = tmp_path / "mix"
    os.makedirs(mix_dir)
    rng = np.random.default_rng(3)
    write_wav(str(mix_dir / "u.wav"),
              0.3 * rng.standard_normal(8000).astype(np.float32), 8000)
    out = str(tmp_path / "out")
    assert separate(ckpt, out, mix_dir=str(mix_dir),
                    tensor_parallel=4) == 1
    assert os.path.exists(os.path.join(out, "u_s2.wav"))


@pytest.mark.parametrize("use_pallas", [True, False])
def test_dpt_tp_train_step_matches_unsharded(use_pallas):
    """TP train step (fused partial custom-VJP pairs per shard / XLA
    partial autodiff) matches the unsharded step: same loss, same grad
    norm, same params after one optimizer step."""
    from convtasnet_tpu.config import SolverConfig
    from convtasnet_tpu.parallel.dpt_tp import make_dpt_tp_train_step
    from convtasnet_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    cfg = ConvTasNetConfig(**{**DPT, "dpt_layers": 1},
                           use_pallas=use_pallas)
    T = 800
    scfg = SolverConfig()
    rng = np.random.default_rng(0)
    Bt = 4
    src = jnp.asarray(rng.standard_normal((Bt, 2, T)) * 0.3, jnp.float32)
    mix = src.sum(axis=1)
    batch = (mix, jnp.full((Bt,), T, jnp.int32), src,
             jnp.ones((Bt,), jnp.float32))

    state1, tx = create_train_state(cfg, scfg, jax.random.PRNGKey(0), T)
    s_ref, m_ref = make_train_step(cfg, tx)(state1, batch)

    state2, tx2 = create_train_state(cfg, scfg, jax.random.PRNGKey(0), T)
    mesh = make_mesh(n_data=2, n_model=4)
    step = make_dpt_tp_train_step(cfg, tx2, mesh, donate=False)
    s_tp, m_tp = step(state2, batch)

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_tp["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=1e-4)
    flat_r = jax.tree_util.tree_leaves(s_ref.params)
    flat_t = jax.tree_util.tree_leaves(s_tp.params)
    for a, b in zip(flat_r, flat_t):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_partial_pairs_grads_match_autodiff():
    """The partial custom-VJP pairs (interpret) reproduce autodiff of the
    partial XLA sublayers exactly — all weight/affine/input cotangents."""
    from convtasnet_tpu.ops.pallas.dpt_attention import (
        fused_inter_attention_ad,
        xla_inter_attention,
    )
    from convtasnet_tpu.ops.pallas.dpt_ffn import fused_ffn_ad, xla_ffn
    from convtasnet_tpu.ops.pallas.dpt_intra import (
        fused_intra_attention_ad,
        xla_intra_attention,
    )

    rng = np.random.default_rng(0)
    M, n, S, B, h, m = 2, 3, 16, 64, 4, 2
    Bl = B // m
    x = jnp.asarray(rng.standard_normal((M, n, S, B)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(B), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(B), jnp.float32)
    wq = jnp.asarray(rng.standard_normal((B, 3 * Bl)) / 8, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((Bl, B)) / 8, jnp.float32)
    bias = jnp.zeros((n, S), jnp.float32)

    def check(fused, ref, args, argn):
        def loss(f):
            return lambda *a: jnp.sum(jnp.square(f(*a)))

        gf = jax.grad(loss(fused), argnums=tuple(range(argn)))(*args)
        gr = jax.grad(loss(ref), argnums=tuple(range(argn)))(*args)
        for a, b in zip(gf, gr):
            # scale-aware: grads are O(100); pointwise fp reorder noise is
            # ~1e-6 relative to the tensor scale
            scale = float(np.max(np.abs(np.asarray(b)))) + 1e-9
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale,
                                       rtol=1e-4, atol=1e-5)

    check(lambda *a: fused_intra_attention_ad(
              *a, bias, n_heads=h // m, bwd=True, interpret=True,
              partial=True),
          lambda *a: xla_intra_attention(*a, bias, n_heads=h // m,
                                         partial=True),
          (x, gamma, beta, wq, wo), 5)
    check(lambda *a: fused_inter_attention_ad(
              *a, bias, n_heads=h // m, bwd=True, interpret=True,
              partial=True),
          lambda *a: xla_inter_attention(*a, bias, n_heads=h // m,
                                         partial=True),
          (x, gamma, beta, wq, wo), 5)

    F, Fl = 128, 64
    x3 = x.reshape(M, n * S, B)
    wu = jnp.asarray(rng.standard_normal((B, Fl)) / 8, jnp.float32)
    bu = jnp.asarray(rng.standard_normal(Fl) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((Fl, B)) / 11, jnp.float32)
    bd = jnp.asarray(rng.standard_normal(B) * 0.1, jnp.float32)
    check(lambda *a: fused_ffn_ad(*a, bwd=True, interpret=True,
                                  partial=True),
          lambda *a: xla_ffn(*a, partial=True),
          (x3, gamma, beta, wu, bu, wd, bd), 7)


def test_solver_routes_dpt_to_tp_step(tmp_path):
    """Solver + a 2-D (data x model) mesh + a dpt model trains through
    make_dpt_tp_train_step end-to-end (one epoch; loss finite and the
    state advances)."""
    from convtasnet_tpu.config import (
        DataConfig,
        SolverConfig,
        TrainConfig,
    )
    from convtasnet_tpu.train.solver import Solver

    class FakeLoader:
        def __init__(self, n_batches=2, B=4, T=800, seed=0):
            rng = np.random.default_rng(seed)
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

    cfg = TrainConfig(
        model=ConvTasNetConfig(**{**DPT, "dpt_layers": 1}),
        data=DataConfig(segment=0.1, batch_size=4),
        solver=SolverConfig(epochs=1, lr=1e-3, print_freq=1000,
                            save_folder=str(tmp_path / "exp")))
    mesh = make_mesh(n_data=2, n_model=4)
    s = Solver(cfg, FakeLoader(), FakeLoader(n_batches=1), mesh=mesh)
    from convtasnet_tpu.parallel import dpt_tp
    assert s.train_step.__qualname__.startswith(
        dpt_tp.make_dpt_tp_train_step.__name__), \
        s.train_step.__qualname__
    result = s.train()
    assert np.isfinite(result["best_val_loss"])


def test_dpt_tp_multi_step_matches_singles():
    """The TP step's scan variant (steps-per-call) equals two single
    steps applied in sequence."""
    from convtasnet_tpu.config import SolverConfig
    from convtasnet_tpu.parallel.dpt_tp import make_dpt_tp_train_step
    from convtasnet_tpu.train.train_step import create_train_state

    cfg = ConvTasNetConfig(**{**DPT, "dpt_layers": 1})
    T = 800
    rng = np.random.default_rng(0)
    Bt = 4

    def mk_batch(seed):
        r = np.random.default_rng(seed)
        src = jnp.asarray(r.standard_normal((Bt, 2, T)) * 0.3, jnp.float32)
        return (src.sum(axis=1), jnp.full((Bt,), T, jnp.int32), src,
                jnp.ones((Bt,), jnp.float32))

    b1, b2 = mk_batch(1), mk_batch(2)
    mesh = make_mesh(n_data=2, n_model=4)

    state1, tx1 = create_train_state(cfg, SolverConfig(),
                                     jax.random.PRNGKey(0), T)
    step = make_dpt_tp_train_step(cfg, tx1, mesh, donate=False)
    s, m1 = step(state1, b1)
    s, m2 = step(s, b2)

    state2, tx2 = create_train_state(cfg, SolverConfig(),
                                     jax.random.PRNGKey(0), T)
    step2 = make_dpt_tp_train_step(cfg, tx2, mesh, donate=False)
    stacked = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), b1, b2)
    s_multi, mm = step2.multi(state2, stacked)
    np.testing.assert_allclose(np.asarray(mm["loss"]),
                               [float(m1["loss"]), float(m2["loss"])],
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s.params),
                    jax.tree_util.tree_leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
