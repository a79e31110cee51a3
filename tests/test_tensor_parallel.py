"""Tensor-parallel (channel-sharded) forward vs the unsharded model on a 2x4
virtual mesh (data=2, model=4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params
from convtasnet_tpu.parallel.mesh import make_mesh
from convtasnet_tpu.parallel.tensor_parallel import (
    param_partition_specs,
    shard_variables,
    tp_forward,
)

TINY = dict(n_filters=16, kernel_size=8, bottleneck=12, hidden=32,
            conv_kernel=3, num_blocks=3, num_repeats=2, num_speakers=2)


@pytest.mark.parametrize("norm_type,causal", [("gLN", False), ("cLN", True),
                                              ("BN", False)])
def test_tp_matches_unsharded(norm_type, causal):
    cfg = ConvTasNetConfig(**TINY, norm_type=norm_type, causal=causal)
    T = 1600
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=T)
    mix = jax.random.normal(jax.random.PRNGKey(1), (4, T))
    want = np.asarray(ConvTasNet(cfg).apply(variables, mix, train=False))

    mesh = make_mesh(n_data=2, n_model=4)
    got = np.asarray(tp_forward(cfg, variables, mix, mesh))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_tp_params_actually_sharded():
    cfg = ConvTasNetConfig(**TINY)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=800)
    mesh = make_mesh(n_data=2, n_model=4)
    placed = shard_variables(variables, mesh, cfg)
    w_in = placed["params"]["separator"]["block_r0_x0"]["conv1x1"]
    # column-sharded over 4 model shards: each holds H/4 columns
    shard_shapes = {s.data.shape for s in w_in.addressable_shards}
    assert shard_shapes == {(12, 8)}  # [B, H/4]
    w_out = placed["params"]["separator"]["block_r0_x0"]["pwconv"]
    assert {s.data.shape for s in w_out.addressable_shards} == {(8, 12)}
    # sharded params feed tp_forward unchanged
    mix = jax.random.normal(jax.random.PRNGKey(1), (2, 800))
    out = tp_forward(cfg, placed, mix, mesh)
    want = ConvTasNet(cfg).apply(variables, mix, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_tp_softmax_three_speakers():
    cfg = ConvTasNetConfig(**{**TINY, "num_speakers": 3},
                           mask_nonlinear="softmax")
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=800)
    mix = jax.random.normal(jax.random.PRNGKey(2), (2, 800))
    mesh = make_mesh(n_data=2, n_model=4)
    got = np.asarray(tp_forward(cfg, variables, mix, mesh))
    want = np.asarray(ConvTasNet(cfg).apply(variables, mix, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
